"""scripts/render.py end-to-end: checkpoint -> trajectory PNGs (CPU)."""

import json
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest
from PIL import Image

REPO_ROOT = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_render_script_from_checkpoint(tmp_path):
    # synthetic blender scene
    data_dir = tmp_path / "scene"
    data_dir.mkdir()
    rng = np.random.RandomState(0)
    for split in ("train", "val", "test"):
        frames = []
        for i in range(2):
            name = f"r_{split}_{i}"
            pose = np.eye(4)
            pose[2, 3] = 2.0
            frames.append({"file_path": f"./{name}", "transform_matrix": pose.tolist()})
            Image.fromarray((rng.rand(8, 8, 3) * 255).astype(np.uint8)).save(data_dir / f"{name}.png")
        (data_dir / f"transforms_{split}.json").write_text(json.dumps({"camera_angle_x": 0.69, "frames": frames}))

    # tiny pipeline config + a checkpoint produced through the library
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(
        f"""
datasets:
  - {{ type: BlenderDataset, base_dir: "{data_dir}", split: "train", test_skip: 1 }}
  - {{ type: BlenderDataset, base_dir: "{data_dir}", split: "val", test_skip: 1 }}
  - {{ type: BlenderDataset, base_dir: "{data_dir}", split: "test", test_skip: 1 }}
pipeline:
  type: NeRFPipeline
  chunk_size_grid: 64
  num_passes: 1
  output_rasterized_mc: false
  loss_weights: {{ loss_rgb_mse: 1.0 }}
  model: {{ type: NeRFMLP, n_layers: 2, input_skips: [1], n_harmonic_functions_xyz: 2,
            n_harmonic_functions_dir: 1, n_hidden_neurons_xyz: 16, n_hidden_neurons_dir: 8 }}
  ray_sampler: {{ type: RaySampler, image_height: 8, image_width: 8, min_depth: 1.0,
                  max_depth: 3.0, n_pts_per_ray_training: 4, n_pts_per_ray_evaluation: 4,
                  n_rays_per_image_sampled_from_mask: 8 }}
  renderer: {{ type: MultipassEmissionAbsorpsionRenderer, n_pts_per_ray_fine_training: 4,
               n_pts_per_ray_fine_evaluation: 4, bg_color: [0.0, 0.0, 0.0] }}
  feature_extractor: []
"""
    )

    from yanerf_tpu.pipelines import PIPELINES
    from yanerf_tpu.runners import create_optimizer, create_train_state, save_checkpoint
    from yanerf_tpu.utils import Config, ConfigDict

    cfg = Config.fromfile(cfg_path)
    pipeline = PIPELINES.build(cfg.pipeline)
    optimizer = create_optimizer(
        ConfigDict(dict(init_lr=1e-3, min_lr=1e-4, lr_decay_type="exponential",
                        lr_decay_rate=0.1, lr_decay_iters=100, warmup_steps=0, warmup_lr=0.0,
                        weight_decay=0.0, num_iters=10))
    )
    state = create_train_state(pipeline.init(jax.random.PRNGKey(0)), optimizer)
    ckpt = save_checkpoint(tmp_path, state, epoch=0)

    out_dir = tmp_path / "renders"
    result = subprocess.run(
        [
            sys.executable, "scripts/render.py",
            "--config", str(cfg_path), "--checkpoint", str(ckpt),
            "--output_dir", str(out_dir), "--trajectory", "test",
            "--device", "cpu", "--n_frames", "2", "--gif",
        ],
        cwd=REPO_ROOT, capture_output=True, text=True, timeout=600,
    )
    assert result.returncode == 0, f"stdout:\n{result.stdout}\nstderr:\n{result.stderr}"
    assert (out_dir / "rgb.gif").exists()
    rgbs = sorted((out_dir / "rgb").glob("*.png"))
    depths = sorted((out_dir / "depth").glob("*.png"))
    assert len(rgbs) == 2 and len(depths) == 2
    img = np.array(Image.open(rgbs[0]))
    assert img.shape == (8, 8, 3)
