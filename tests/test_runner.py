"""End-to-end runner test: tiny NeRF overfits a 2x2 image (reference tests/test_runner.py).

The convergence assertion (objective < 0.01 after ~50 iters) is the de-facto
correctness test for optimizer + loss + renderer together.
"""

import os.path as osp
from typing import Callable, NamedTuple

import jax
import numpy as np
import pytest

from yanerf_tpu.datasets.loader import DataLoader, create_sampler
from yanerf_tpu.pipelines import PIPELINES
from yanerf_tpu.runners import (
    RunType,
    create_lr_schedule,
    create_optimizer,
    create_stats,
    create_train_state,
    eval_one_epoch,
    make_eval_step,
    make_train_step,
    train_one_epoch,
)
from yanerf_tpu.utils import Config, ConfigDict

CFG_DIR = osp.join(osp.dirname(__file__), "configs")


class DummyDatasetWrapper(NamedTuple):
    poses: np.ndarray
    focal_lengths: np.ndarray
    image_rgb: np.ndarray


class DummyDataset:
    """A single fixed camera looking at a fixed 2x2 image."""

    data_wrapper: Callable = DummyDatasetWrapper

    def __init__(self, n_items=8, hw=2):
        rng = np.random.RandomState(0)
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = -2.0
        self.pose = pose
        self.focal = np.asarray([2.0], dtype=np.float32)
        self.image = rng.rand(hw, hw, 3).astype(np.float32)
        self.n_items = n_items

    def __getitem__(self, idx):
        return self.pose, self.focal, self.image

    def __len__(self):
        return self.n_items


def _tiny_pipeline(hw=2):
    cfg = Config.fromfile(osp.join(CFG_DIR, "pipelines", "nerf_pipeline_cfg_with_mlp.py"))
    cfg.pipeline.ray_sampler.image_width = hw
    cfg.pipeline.ray_sampler.image_height = hw
    cfg.pipeline.ray_sampler.n_rays_per_image_sampled_from_mask = hw * hw
    cfg.pipeline.ray_sampler.min_depth = 1.0
    cfg.pipeline.ray_sampler.max_depth = 3.0
    cfg.pipeline.output_rasterized_mc = False
    cfg.pipeline.num_passes = 1
    cfg.pipeline.loss_weights = {"loss_rgb_mse": 1.0}
    cfg.pipeline.renderer.density_noise_std_train = 0.0
    return PIPELINES.build(cfg.pipeline)


RUNNER_CFG = ConfigDict(
    dict(
        init_lr=5e-3,
        min_lr=5e-4,
        weight_decay=0.0,
        warmup_steps=0,
        warmup_lr=1e-5,
        lr_decay_type="exponential",
        lr_decay_rate=0.1,
        lr_decay_iters=10000,
        num_iters=100,
        print_per_iter=25,
        val_per_iter=10_000_000,
        output_dir=None,
        hooks=[],
    )
)


def test_train_converges_and_eval_runs(tmp_path):
    pipeline = _tiny_pipeline()
    dataset = DummyDataset()
    loader = DataLoader(dataset, create_sampler(dataset, shuffle=True), batch_size=1, is_train=True, num_workers=0)

    optimizer = create_optimizer(RUNNER_CFG)
    params = pipeline.init(jax.random.PRNGKey(0))
    state = create_train_state(params, optimizer)

    train_step = make_train_step(pipeline, optimizer)
    rng = jax.random.PRNGKey(42)

    cfg = ConfigDict(dict(RUNNER_CFG))
    cfg.output_dir = str(tmp_path)
    stats = {}
    for epoch in range(8):  # 8 epochs x 8 items = 64 iters
        state, stats = train_one_epoch(
            RunType.TRAIN, cfg, epoch, state, loader, train_step, rng,
            lr_schedule=create_lr_schedule(cfg),
        )
    assert stats["objective"] < 0.01, f"did not converge: {stats}"
    assert "loss_rgb_psnr" in stats

    # eval on the same data must reproduce the overfit image
    eval_loader = DataLoader(dataset, create_sampler(dataset, shuffle=False), batch_size=1, is_train=False, num_workers=0)
    eval_step = make_eval_step(pipeline)
    eval_stats = eval_one_epoch(
        RunType.VAL, cfg, 0, state.params, eval_loader, eval_step, rng, save_image=True
    )
    assert eval_stats["objective"] < 0.01
    assert eval_stats["loss_rgb_psnr"] > 20.0
    # vis dumps exist
    vis_root = tmp_path / "visualization" / "val"
    assert any(vis_root.rglob("*.png"))


def test_checkpoint_roundtrip(tmp_path):
    from yanerf_tpu.runners import load_checkpoint, save_checkpoint

    pipeline = _tiny_pipeline()
    optimizer = create_optimizer(RUNNER_CFG)
    params = pipeline.init(jax.random.PRNGKey(0))
    state = create_train_state(params, optimizer)

    path = save_checkpoint(tmp_path, state, epoch=3)
    assert path.name == "ckpts_0003"
    restored = load_checkpoint(path, state)
    assert restored["epoch"] == 3
    orig = jax.tree_util.tree_leaves(state.params)
    back = jax.tree_util.tree_leaves(restored["state"].params)
    for a, b in zip(orig, back):
        assert np.allclose(np.asarray(a), np.asarray(b))

    # best-model naming contract
    best = save_checkpoint(tmp_path, state, epoch=-1)
    assert best.name == "ckpts_-001"


def test_lr_schedules():
    cfg = ConfigDict(
        dict(init_lr=1e-3, min_lr=1e-4, lr_decay_type="exponential", lr_decay_rate=0.1,
             lr_decay_iters=1000, warmup_steps=100, warmup_lr=1e-5, num_iters=2000)
    )
    sched = create_lr_schedule(cfg)
    assert abs(float(sched(0)) - 1e-5) < 1e-9  # warmup start
    assert abs(float(sched(100)) - 1e-3) < 1e-6  # warmup end hits init_lr
    assert abs(float(sched(1000)) - 1e-4) < 1e-6  # one decay period
    assert abs(float(sched(10**6)) - 1e-4) < 1e-9  # clamped at min_lr

    cfg.lr_decay_type = "cosine"
    sched = create_lr_schedule(cfg)
    assert float(sched(101)) <= 1e-3 + 1e-9


def test_param_groups_scale_lr():
    pipeline = _tiny_pipeline()
    params = pipeline.init(jax.random.PRNGKey(0))
    cfg = ConfigDict(dict(RUNNER_CFG))
    cfg.lr_param_groups = [dict(prefix="implicit_functions.0.density_layer", base=0.5)]
    optimizer = create_optimizer(cfg, params)
    state = create_train_state(params, optimizer)

    import jax.numpy as jnp

    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = optimizer.update(grads, state.opt_state, params)
    # With unit grads and fresh Adam state the update magnitude ~= lr, so the
    # group's update must be ~0.5x the default group's.
    group = np.abs(np.asarray(updates["implicit_functions"][0]["density_layer"]["w"])).mean()
    default = np.abs(np.asarray(updates["implicit_functions"][0]["xyz_encoder"]["mlp"][0]["w"])).mean()
    assert abs(group / default - 0.5) < 1e-3


def test_create_stats_derives_psnr():
    stats = create_stats({"loss_rgb_mse": np.asarray([0.01, 0.01]), "other": 5})
    assert abs(stats["loss_rgb_mse"] - 0.01) < 1e-9
    assert abs(stats["loss_rgb_psnr"] - 20.0) < 1e-6
    assert "other" not in stats


def test_async_vis_writer_propagates_worker_errors(tmp_path):
    import numpy as np
    import pytest

    from yanerf_tpu.runners.vis import AsyncVisWriter, RunType

    writer = AsyncVisWriter()
    preds = {"rendered_images": np.zeros((1, 4, 4, 3), dtype=np.float32)}
    writer.submit(preds, RunType.TEST, str(tmp_path), 0, 1)
    writer.close()
    assert (tmp_path / "visualization" / "test" / "rendered_images" / "00000.png").exists()

    # a worker-side failure must surface at close(), not be swallowed
    bad = AsyncVisWriter()
    bad.submit(preds, RunType.TEST, "/proc/definitely/not/writable", 0, 1)
    with pytest.raises(Exception):
        bad.close()


def test_eval_frames_in_flight_depth_is_result_identical(tmp_path):
    """eval_frames_in_flight only reorders host-side consumption: stats and
    written frames must be bit-identical at any pipelining depth."""
    pipeline = _tiny_pipeline()
    dataset = DummyDataset(n_items=5)  # not a multiple of any depth
    params = pipeline.init(jax.random.PRNGKey(0))
    eval_step = make_eval_step(pipeline)
    rng = jax.random.PRNGKey(7)

    stats_by_depth = {}
    for depth in (1, 3):
        cfg = ConfigDict(dict(RUNNER_CFG))
        (tmp_path / f"d{depth}").mkdir()
        cfg.output_dir = str(tmp_path / f"d{depth}")
        cfg.eval_frames_in_flight = depth
        loader = DataLoader(
            dataset, create_sampler(dataset, shuffle=False), batch_size=1, is_train=False, num_workers=0
        )
        stats_by_depth[depth] = eval_one_epoch(
            RunType.VAL, cfg, 0, params, loader, eval_step, rng, save_image=True
        )
    assert stats_by_depth[1] == stats_by_depth[3]
    f1 = sorted(p.relative_to(tmp_path / "d1") for p in (tmp_path / "d1").rglob("*.png"))
    f3 = sorted(p.relative_to(tmp_path / "d3") for p in (tmp_path / "d3").rglob("*.png"))
    assert f1 == f3 and len(f1) == 15  # 5 frames x (images, depths, alpha masks)
    for rel in f1:
        assert (tmp_path / "d1" / rel).read_bytes() == (tmp_path / "d3" / rel).read_bytes()
