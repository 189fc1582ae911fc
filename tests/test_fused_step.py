"""Fused multi-step trainer (``make_train_step_fused`` + the fused epoch
loop): grouping K optimizer steps into one ``lax.scan`` dispatch must be
numerically identical to K sequential single-step calls — same sampler
indices, same per-step RNG (folded by global step), same updates."""

import pytest
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from yanerf_tpu.datasets.loader import DataLoader, DeviceCachedLoader, create_sampler
from yanerf_tpu.pipelines import PIPELINES
from yanerf_tpu.runners import (
    RunType,
    create_optimizer,
    create_train_state,
    make_train_step,
    make_train_step_fused,
    prepare_batch,
    train_one_epoch,
)
from yanerf_tpu.utils import ConfigDict


def _tiny_pipeline_cfg(hw=4):
    return dict(
        type="NeRFPipeline",
        chunk_size_grid=64,
        num_passes=1,
        output_rasterized_mc=False,
        loss_weights={"loss_rgb_mse": 1.0},
        model=dict(
            type="NeRFMLP",
            n_layers=2,
            input_skips=[1],
            n_harmonic_functions_xyz=2,
            n_harmonic_functions_dir=1,
            n_hidden_neurons_xyz=16,
            n_hidden_neurons_dir=8,
            latent_dim=0,
            color_dim=3,
        ),
        ray_sampler=dict(
            type="RaySampler",
            image_height=hw,
            image_width=hw,
            min_depth=1.0,
            max_depth=3.0,
            n_pts_per_ray_training=4,
            n_pts_per_ray_evaluation=4,
            n_rays_per_image_sampled_from_mask=8,
        ),
        renderer=dict(
            type="MultipassEmissionAbsorpsionRenderer",
            n_pts_per_ray_fine_training=4,
            n_pts_per_ray_fine_evaluation=4,
            bg_color=[0.0, 0.0, 0.0],
            density_noise_std_train=0.0,
        ),
        feature_extractor=[],
    )


class W(NamedTuple):
    poses: np.ndarray
    focal_lengths: np.ndarray
    image_rgb: np.ndarray


class TinyDataset:
    data_wrapper: Callable = W

    def __init__(self, n=8, hw=4):
        rng = np.random.RandomState(0)
        self.poses = [np.eye(4, dtype=np.float32) for _ in range(n)]
        for i, p in enumerate(self.poses):
            p[2, 3] = 2.0 + 0.1 * i
        self.images = [rng.rand(hw, hw, 3).astype(np.float32) for _ in range(n)]
        self.focal = np.asarray([4.0], dtype=np.float32)

    def __getitem__(self, i):
        return self.poses[i], self.focal, self.images[i]

    def __len__(self):
        return len(self.poses)


def _runner_cfg(tmp_path, **over):
    cfg = dict(
        init_lr=1e-3,
        min_lr=1e-4,
        weight_decay=0.0,
        warmup_steps=0,
        warmup_lr=1e-5,
        lr_decay_type="exponential",
        lr_decay_rate=0.1,
        lr_decay_iters=10000,
        num_iters=16,
        print_per_iter=4,
        val_per_iter=10_000_000,
        output_dir=str(tmp_path),
        hooks=[],
    )
    cfg.update(over)
    return ConfigDict(cfg)


def _max_param_diff(a, b):
    leaves_a = jax.tree_util.tree_leaves(a.params)
    leaves_b = jax.tree_util.tree_leaves(b.params)
    return max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(leaves_a, leaves_b))


@pytest.mark.slow
def test_fused_step_matches_sequential_steps():
    pipeline = PIPELINES.build(_tiny_pipeline_cfg())
    dataset = TinyDataset()
    optimizer = create_optimizer(_runner_cfg("/tmp"))
    rng = jax.random.PRNGKey(3)

    # 6 sequential single steps
    step = make_train_step(pipeline, optimizer, donate=False)
    state_a = create_train_state(pipeline.init(jax.random.PRNGKey(0)), optimizer)
    idx_rows = [np.array([i % len(dataset)]) for i in range(6)]
    for row in idx_rows:
        item = dataset[int(row[0])]
        batch = prepare_batch(tuple(np.asarray(f)[None] for f in item), W, None)
        state_a, _ = step(state_a, batch, rng)

    # the same 6 steps as fused groups of 4 + 2 against the stacked dataset
    fused = make_train_step_fused(pipeline, optimizer, W, donate=False)
    state_b = create_train_state(pipeline.init(jax.random.PRNGKey(0)), optimizer)
    stacked = tuple(
        jnp.stack([jnp.asarray(f) for f in field])
        for field in zip(*[dataset[i] for i in range(len(dataset))])
    )
    idx_mat = jnp.asarray(np.stack(idx_rows))
    state_b, hist = fused(state_b, stacked, idx_mat[:4], rng)
    state_b, hist2 = fused(state_b, stacked, idx_mat[4:], rng)

    assert int(state_a.step) == int(state_b.step) == 6
    assert _max_param_diff(state_a, state_b) < 1e-6
    assert hist["objective"].shape == (4, 1)
    assert hist2["loss_rgb_mse"].shape == (2, 1)


def test_fused_epoch_loop_matches_per_step_loop(tmp_path):
    """train_one_epoch with steps_per_call + DeviceCachedLoader must produce
    the same TrainState as the plain per-step loop."""
    pipeline = PIPELINES.build(_tiny_pipeline_cfg())
    dataset = TinyDataset()
    optimizer = create_optimizer(_runner_cfg(tmp_path))
    rng = jax.random.PRNGKey(7)

    def run(cfg, fused):
        loader = DataLoader(
            dataset, create_sampler(dataset, shuffle=True), batch_size=2, is_train=True, num_workers=0
        )
        loader = DeviceCachedLoader(loader)
        state = create_train_state(pipeline.init(jax.random.PRNGKey(0)), optimizer)
        step = make_train_step(pipeline, optimizer, donate=False)
        fused_step = make_train_step_fused(pipeline, optimizer, W, donate=False) if fused else None
        for epoch in range(2):
            state, stats = train_one_epoch(
                RunType.TRAIN, cfg, epoch, state, loader, step, rng, train_step_fused=fused_step
            )
        return state, stats

    state_seq, stats_seq = run(_runner_cfg(tmp_path), fused=False)
    state_fused, stats_fused = run(_runner_cfg(tmp_path, steps_per_call=3), fused=True)

    assert int(state_seq.step) == int(state_fused.step) == 8
    assert _max_param_diff(state_seq, state_fused) < 1e-6
    np.testing.assert_allclose(stats_seq["objective"], stats_fused["objective"], rtol=1e-4)


def test_fused_epoch_runs_vis_steps_at_val_boundaries(tmp_path):
    """val_per_iter boundaries inside an epoch must still run the unfused
    rasterizing vis step and dump training images."""
    pipeline = PIPELINES.build(_tiny_pipeline_cfg())
    dataset = TinyDataset()
    cfg = _runner_cfg(tmp_path, steps_per_call=3, val_per_iter=2)
    optimizer = create_optimizer(cfg)
    loader = DeviceCachedLoader(
        DataLoader(dataset, create_sampler(dataset, shuffle=False), batch_size=2, is_train=True, num_workers=0)
    )
    state = create_train_state(pipeline.init(jax.random.PRNGKey(0)), optimizer)
    step = make_train_step(pipeline, optimizer, donate=False)
    step_vis = make_train_step(pipeline, optimizer, rasterize_mc=True, donate=False)
    fused_step = make_train_step_fused(pipeline, optimizer, W, donate=False)
    state, _ = train_one_epoch(
        RunType.TRAIN, cfg, 0, state, loader, step, jax.random.PRNGKey(1),
        train_step_vis=step_vis, train_step_fused=fused_step,
    )
    assert int(state.step) == 4
    vis_root = tmp_path / "visualization" / "train"
    pngs = list(vis_root.rglob("*.png"))
    assert pngs, "expected training vis dumps at val_per_iter boundaries"


class EightBitDataset(TinyDataset):
    """TinyDataset but with 8-bit-sourced images (k/255 values), matching
    what the PNG loaders produce — eligible for lossless uint8 caching."""

    def __init__(self, n=8, hw=4):
        super().__init__(n=n, hw=hw)
        rng = np.random.RandomState(1)
        self.images = [
            (rng.randint(0, 256, size=(hw, hw, 3)).astype(np.float32) / 255.0) for _ in range(n)
        ]


@pytest.mark.slow
def test_fused_epoch_with_quantized_cache_is_bit_transparent(tmp_path):
    """The uint8-quantized device cache must be invisible to training: the
    SAME fused program over the quantized cache produces a bit-identical
    TrainState to the float32 cache (the decode is the correctly-rounded
    f32 division the host loaders use). Fused-vs-per-step equivalence is
    covered separately by test_fused_epoch_loop_matches_per_step_loop."""
    pipeline = PIPELINES.build(_tiny_pipeline_cfg())
    dataset = EightBitDataset()
    optimizer = create_optimizer(_runner_cfg(tmp_path))
    rng = jax.random.PRNGKey(7)

    def run(quantize):
        loader = DataLoader(
            dataset, create_sampler(dataset, shuffle=True), batch_size=2, is_train=True, num_workers=0
        )
        loader = DeviceCachedLoader(loader, quantize_images=quantize)
        state = create_train_state(pipeline.init(jax.random.PRNGKey(0)), optimizer)
        step = make_train_step(pipeline, optimizer, donate=False)
        fused_step = make_train_step_fused(pipeline, optimizer, W, donate=False)
        cfg = _runner_cfg(tmp_path, steps_per_call=3)
        for epoch in range(2):
            state, stats = train_one_epoch(
                RunType.TRAIN, cfg, epoch, state, loader, step, rng, train_step_fused=fused_step
            )
        return state, loader

    state_f32, loader_f32 = run(quantize=False)
    state_u8, loader_u8 = run(quantize=True)
    assert loader_u8._arrays[2].dtype == np.uint8  # image field actually quantized
    assert loader_f32._arrays[2].dtype == np.float32
    assert int(state_f32.step) == int(state_u8.step) == 8
    assert _max_param_diff(state_f32, state_u8) == 0.0  # bit-identical
