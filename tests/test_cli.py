"""End-to-end CLI test: scripts/run.py on a synthetic Blender scene (CPU).

Verifies the full reference contract: versioned output dirs, resolved config
dump, stats JSONL files, checkpoints (periodic + final), visualization PNGs,
and the train -> val -> test flow.
"""

import json
import os.path as osp
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO_ROOT = Path(__file__).resolve().parent.parent


def _make_blender(root: Path, hw=8, n=4):
    root.mkdir(parents=True)
    rng = np.random.RandomState(0)
    # one shared image set: the scene is tiny, we only smoke-test the plumbing
    for split in ("train", "val", "test"):
        frames = []
        for i in range(n):
            name = f"r_{split}_{i}"
            pose = np.eye(4)
            pose[2, 3] = 2.0 + 0.05 * i
            frames.append({"file_path": f"./{name}", "transform_matrix": pose.tolist()})
            img = (rng.rand(hw, hw, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(root / f"{name}.png")
        (root / f"transforms_{split}.json").write_text(
            json.dumps({"camera_angle_x": 0.6911, "frames": frames})
        )


CFG_TEMPLATE = """
datasets:
  - {{ type: BlenderDataset, base_dir: "{data_dir}", split: "train", test_skip: 1 }}
  - {{ type: BlenderDataset, base_dir: "{data_dir}", split: "val", test_skip: 2 }}
  - {{ type: BlenderDataset, base_dir: "{data_dir}", split: "test", test_skip: 2 }}

runner:
  eval_last_epoch_model: true
  seed: 42
  output_dir: {output_dir}
  debug: False
  print_per_iter: 4
  val_per_iter: 8
  save_per_iter: 8
  init_lr: 5.0e-3
  weight_decay: 0.0
  warmup_steps: 2
  warmup_lr: 1.0e-5
  linear_scale: True
  lr_decay_type: exponential
  min_lr: 5.0e-4
  lr_decay_rate: 0.1
  lr_decay_iters: 1000
  batch_size_list: [1, 1, 1]
  num_workers_list: [0, 0, 0]
  num_iters: 8
  hooks: []
  lr_param_groups: []
  mesh: {{ data_parallel: 1, ray_parallel: 1 }}

pipeline:
  type: NeRFPipeline
  chunk_size_grid: 64
  num_passes: 2
  output_rasterized_mc: true
  loss_weights: {{ loss_prev_stage_rgb_mse: 1.0, loss_rgb_mse: 1.0 }}
  model:
    type: NeRFMLP
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
    n_pts_per_ray_training: 4
    n_pts_per_ray_evaluation: 4
    n_rays_per_image_sampled_from_mask: 8
  renderer:
    type: MultipassEmissionAbsorpsionRenderer
    n_pts_per_ray_fine_training: 4
    n_pts_per_ray_fine_evaluation: 4
    bg_color: [0.0, 0.0, 0.0]
    density_noise_std_train: 0.0
  feature_extractor: []
"""


@pytest.mark.slow
def test_run_cli_end_to_end(tmp_path):
    data_dir = tmp_path / "data"
    _make_blender(data_dir)
    output_root = tmp_path / "results"
    cfg_path = tmp_path / "tiny.yml"
    cfg_path.write_text(CFG_TEMPLATE.format(data_dir=data_dir, output_dir=output_root))

    result = subprocess.run(
        [sys.executable, "scripts/run.py", "--config", str(cfg_path), "--device", "cpu"],
        cwd=REPO_ROOT,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert result.returncode == 0, f"stdout:\n{result.stdout}\nstderr:\n{result.stderr}"

    out_dir = output_root / "version_0"
    assert (out_dir / "config.yml").exists()
    assert (out_dir / "run.log").exists()
    assert (out_dir / "train_stats.json").exists()
    assert (out_dir / "val_stats.json").exists()
    assert (out_dir / "test_stats.json").exists()

    train_stats = [json.loads(line) for line in (out_dir / "train_stats.json").read_text().splitlines()]
    assert len(train_stats) == 2  # 8 iters / 4 per epoch
    assert "train_objective" in train_stats[0]
    test_stats = json.loads((out_dir / "test_stats.json").read_text().splitlines()[-1])
    assert "test_loss_rgb_psnr" in test_stats

    ckpts = sorted(p.name for p in (out_dir / "ckpts").iterdir())
    assert "ckpts_0001" in ckpts  # periodic/final save
    assert any(name == "ckpts_-001" for name in ckpts)  # best-model save

    vis = list((out_dir / "visualization").rglob("*.png"))
    assert vis, "expected visualization dumps"

    # a second training run gets a fresh version_1 directory
    result2 = subprocess.run(
        [sys.executable, "scripts/run.py", "--config", str(cfg_path), "--device", "cpu"],
        cwd=REPO_ROOT,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert result2.returncode == 0, result2.stderr
    assert (output_root / "version_1" / "config.yml").exists()


def test_find_latest_checkpoint_prefers_newest_mtime(tmp_path):
    import os
    import time as _time

    from yanerf_tpu.runners.checkpoints import find_latest_checkpoint

    assert find_latest_checkpoint(tmp_path) is None
    v0 = tmp_path / "version_0" / "ckpts"
    v1 = tmp_path / "version_1" / "ckpts"
    for d in (v0 / "ckpts_0001", v0 / "ckpts_-001", v1 / "ckpts_0000", v1 / "ckpts_preempt"):
        d.mkdir(parents=True)
    now = _time.time()
    os.utime(v0 / "ckpts_0001", (now - 30, now - 30))
    os.utime(v0 / "ckpts_-001", (now, now))  # best alias: newest mtime but must be excluded
    os.utime(v1 / "ckpts_0000", (now - 20, now - 20))
    os.utime(v1 / "ckpts_preempt", (now - 10, now - 10))
    vd, ckpt = find_latest_checkpoint(tmp_path)
    assert vd == tmp_path / "version_1"
    assert ckpt.name == "ckpts_preempt"


@pytest.mark.slow
def test_run_cli_auto_resume(tmp_path):
    """A second invocation with --auto_resume reuses version_0 and continues
    from the saved epoch instead of starting version_1 from scratch."""
    data_dir = tmp_path / "data"
    _make_blender(data_dir)
    output_root = tmp_path / "results"
    cfg_path = tmp_path / "tiny.yml"
    cfg_path.write_text(CFG_TEMPLATE.format(data_dir=data_dir, output_dir=output_root))

    env = dict(__import__("os").environ)
    env.update(JAX_PLATFORMS="cpu", XLA_FLAGS="--xla_force_host_platform_device_count=8")
    r1 = subprocess.run(
        [sys.executable, "scripts/run.py", "--config", str(cfg_path), "--device", "cpu"],
        cwd=REPO_ROOT, capture_output=True, text=True, timeout=600, env=env,
    )
    assert r1.returncode == 0, r1.stderr

    # the resume leg also covers runner.train_vis=false (no MC-rasterize vis
    # program built; the sanity-dump message must not appear for this leg)
    r2 = subprocess.run(
        [sys.executable, "scripts/run.py", "--config", str(cfg_path), "--device", "cpu",
         "--auto_resume", "--cfg_options", "runner.num_iters=16", "runner.train_vis=False"],
        cwd=REPO_ROOT, capture_output=True, text=True, timeout=600, env=env,
    )
    assert r2.returncode == 0, r2.stderr
    assert not (output_root / "version_1").exists(), "auto_resume must reuse version_0"
    log = (output_root / "version_0" / "run.log").read_text()
    assert "Resumed checkpoint from" in log
    resumed_leg = log.split("Resumed checkpoint from", 1)[1]
    assert "save training image" not in resumed_leg
    # training continued past the first run's final epoch (8 iters = 2 epochs)
    train_stats = [
        json.loads(line)
        for line in (output_root / "version_0" / "train_stats.json").read_text().splitlines()
    ]
    assert train_stats[-1]["epoch"] >= 2
