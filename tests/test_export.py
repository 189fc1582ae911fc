"""Serving export (scripts/export.py): the serialized StableHLO artifact
must reproduce the framework's render bit-for-bit and load without the
framework's registries/config in the consumer path."""

import pytest
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent

TINY_CFG = """
runner:
  init_lr: 1.0e-3
  min_lr: 1.0e-4
  weight_decay: 0.0
  warmup_steps: 0
  warmup_lr: 1.0e-5
  lr_decay_type: exponential
  lr_decay_rate: 0.1
  lr_decay_iters: 1000
  num_iters: 10

pipeline:
  type: NeRFPipeline
  chunk_size_grid: 64
  num_passes: 2
  output_rasterized_mc: false
  loss_weights: { loss_rgb_mse: 1.0, loss_proposal: 1.0 }
  model:
    - { type: ProposalMLP, n_layers: 2, hidden_dim: 16, n_harmonic_functions_xyz: 2 }
    - type: NeRFMLP
      n_layers: 2
      input_skips: [1]
      n_harmonic_functions_xyz: 2
      n_harmonic_functions_dir: 1
      n_hidden_neurons_xyz: 16
      n_hidden_neurons_dir: 8
      latent_dim: 0
      color_dim: 3
  ray_sampler:
    type: RaySampler
    image_height: 8
    image_width: 8
    min_depth: 1.0
    max_depth: 3.0
    n_pts_per_ray_training: 6
    n_pts_per_ray_evaluation: 6
    n_rays_per_image_sampled_from_mask: 8
  renderer:
    type: ProposalEmissionAbsorpsionRenderer
    n_pts_per_ray_final_training: 4
    n_pts_per_ray_final_evaluation: 4
    bg_color: [0.0, 0.0, 0.0]
    background_density_bias: 1.0e-6
  feature_extractor: []
"""


@pytest.mark.slow
def test_export_roundtrip(tmp_path):
    cfg = tmp_path / "tiny.yml"
    cfg.write_text(TINY_CFG)
    out = tmp_path / "render.nerfx"
    result = subprocess.run(
        [sys.executable, "scripts/export.py", "--config", str(cfg), "--out", str(out), "--validate", "--device", "cpu"],
        cwd=REPO_ROOT, capture_output=True, text=True, timeout=300,
    )
    assert result.returncode == 0, f"stdout:\n{result.stdout}\nstderr:\n{result.stderr}"
    assert "validate OK" in result.stdout
    assert out.stat().st_size > 0

    # consumer-side load needs only jax
    from jax import export as jax_export

    restored = jax_export.deserialize(out.read_bytes())
    poses = np.broadcast_to(np.eye(4, dtype=np.float32), (1, 4, 4)).copy()
    poses[:, 2, 3] = 4.0
    focals = np.full((1, 1), 8.0, dtype=np.float32)
    images = np.asarray(restored.call(poses, focals))
    assert images.shape == (1, 8, 8, 3)
    assert np.isfinite(images).all()
