"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

What the reference could not test (its dist helpers no-op at world_size 1,
SURVEY.md §4), we can: GSPMD-sharded train/eval steps must produce the same
numbers as the unsharded program, because sharding only changes placement.
"""

import pytest
import os.path as osp
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from yanerf_tpu.parallel import create_mesh, mesh_context
from yanerf_tpu.pipelines import PIPELINES
from yanerf_tpu.runners import (
    create_optimizer,
    create_train_state,
    make_eval_step,
    make_train_step,
    prepare_batch,
)
from yanerf_tpu.utils import Config, ConfigDict

CFG_DIR = osp.join(osp.dirname(__file__), "configs")

RUNNER_CFG = ConfigDict(
    dict(
        init_lr=5e-3, min_lr=5e-4, weight_decay=0.0, warmup_steps=0, warmup_lr=1e-5,
        lr_decay_type="exponential", lr_decay_rate=0.1, lr_decay_iters=10000, num_iters=100,
    )
)


class W(NamedTuple):
    poses: np.ndarray
    focal_lengths: np.ndarray
    image_rgb: np.ndarray


def _pipeline(n_rays=8):
    cfg = Config.fromfile(osp.join(CFG_DIR, "pipelines", "nerf_pipeline_cfg_with_mlp.py"))
    cfg.pipeline.ray_sampler.image_width = 8
    cfg.pipeline.ray_sampler.image_height = 8
    cfg.pipeline.ray_sampler.n_rays_per_image_sampled_from_mask = n_rays
    cfg.pipeline.output_rasterized_mc = False
    return PIPELINES.build(cfg.pipeline)


def _batch():
    rng = np.random.RandomState(0)
    poses = np.broadcast_to(np.eye(4, dtype=np.float32), (2, 4, 4)).copy()
    poses[:, 2, 3] = -2.0
    focals = np.full((2, 1), 4.0, dtype=np.float32)
    image = rng.rand(2, 8, 8, 3).astype(np.float32)
    return (poses, focals, image)


@pytest.mark.slow
def test_sharded_train_step_matches_unsharded():
    pipeline = _pipeline()
    optimizer = create_optimizer(RUNNER_CFG)
    params = pipeline.init(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(7)

    # unsharded
    state = create_train_state(params, optimizer)
    step = make_train_step(pipeline, optimizer, mesh=None, donate=False)
    batch = prepare_batch(_batch(), W, None)
    state1, preds1 = step(state, batch, rng)

    # sharded over a 2 (data) x 4 (rays) mesh
    mesh = create_mesh(data_parallel=2, ray_parallel=4)
    state_m = create_train_state(params, optimizer)
    step_m = make_train_step(pipeline, optimizer, mesh=mesh, donate=False)
    batch_m = prepare_batch(_batch(), W, mesh)
    state2, preds2 = step_m(state_m, batch_m, rng)

    np.testing.assert_allclose(
        np.asarray(preds1["objective"]), np.asarray(preds2["objective"]), rtol=2e-5, atol=2e-6
    )
    for a, b in zip(jax.tree_util.tree_leaves(state1.params), jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_sharded_eval_matches_unsharded():
    pipeline = _pipeline()
    params = pipeline.init(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(3)
    batch = prepare_batch(_batch(), W, None)

    eval_plain = make_eval_step(pipeline, mesh=None)
    preds1 = eval_plain(params, batch, rng)

    mesh = create_mesh(data_parallel=1, ray_parallel=8)
    eval_sharded = make_eval_step(pipeline, mesh=mesh)
    preds2 = eval_sharded(params, prepare_batch(_batch(), W, mesh), rng)

    np.testing.assert_allclose(
        np.asarray(preds1["rendered_images"]), np.asarray(preds2["rendered_images"]), rtol=2e-5, atol=2e-6
    )


def test_ray_sharding_actually_partitions():
    """The compiled sharded program must place the ray axis across devices."""
    pipeline = _pipeline(n_rays=8)
    params = pipeline.init(jax.random.PRNGKey(0))
    mesh = create_mesh(data_parallel=1, ray_parallel=8)
    rng = jax.random.PRNGKey(0)
    batch = prepare_batch(_batch(), W, mesh)

    from yanerf_tpu.ops.structures import EvaluationMode

    def fwd(params, batch, rng):
        preds = pipeline.forward(
            params, rng, evaluation_mode=EvaluationMode.TRAINING, output_rasterized_mc=False, **batch
        )
        return preds["objective"]

    with mesh_context(mesh):
        lowered = jax.jit(fwd).lower(params, batch, rng)
        compiled_text = lowered.compile().as_text()
    # sharded programs contain cross-device collectives for the loss reduction
    assert ("all-reduce" in compiled_text) or ("all-gather" in compiled_text), (
        "expected collectives in the compiled sharded program"
    )


def _proposal_pipeline(n_rays=8):
    cfg = dict(
        type="NeRFPipeline",
        chunk_size_grid=64,
        num_passes=2,
        output_rasterized_mc=False,
        loss_weights={"loss_rgb_mse": 1.0, "loss_proposal": 1.0},
        model=[
            dict(type="ProposalMLP", n_layers=2, hidden_dim=16, n_harmonic_functions_xyz=2),
            dict(
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
        ],
        ray_sampler=dict(
            type="RaySampler",
            image_height=8,
            image_width=8,
            min_depth=1.0,
            max_depth=3.0,
            n_pts_per_ray_training=6,
            n_pts_per_ray_evaluation=6,
            n_rays_per_image_sampled_from_mask=n_rays,
        ),
        renderer=dict(
            type="ProposalEmissionAbsorpsionRenderer",
            n_pts_per_ray_final_training=4,
            n_pts_per_ray_final_evaluation=4,
            bg_color=[0.0, 0.0, 0.0],
            density_noise_std_train=0.0,
            background_density_bias=1.0e-6,
        ),
        feature_extractor=[],
    )
    return PIPELINES.build(cfg)


def test_sharded_proposal_train_step_matches_unsharded():
    """The proposal renderer (importance resampling + interlevel loss) must
    shard transparently over the (data, rays) mesh like the classic path."""
    pipeline = _proposal_pipeline()
    optimizer = create_optimizer(RUNNER_CFG)
    params = pipeline.init(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(7)

    state = create_train_state(params, optimizer)
    step = make_train_step(pipeline, optimizer, mesh=None, donate=False)
    state1, preds1 = step(state, prepare_batch(_batch(), W, None), rng)

    mesh = create_mesh(data_parallel=2, ray_parallel=4)
    state_m = create_train_state(params, optimizer)
    step_m = make_train_step(pipeline, optimizer, mesh=mesh, donate=False)
    state2, preds2 = step_m(state_m, prepare_batch(_batch(), W, mesh), rng)

    np.testing.assert_allclose(
        np.asarray(preds1["objective"]), np.asarray(preds2["objective"]), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(preds1["loss_proposal"]), np.asarray(preds2["loss_proposal"]), rtol=2e-5, atol=2e-6
    )
    for a, b in zip(jax.tree_util.tree_leaves(state1.params), jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_fused_multi_step_under_mesh_matches_unsharded_sequential():
    """make_train_step_fused under a (data, rays) mesh == sequential
    unsharded single steps: grouping and sharding are both transparent."""
    from yanerf_tpu.runners import make_train_step_fused

    pipeline = _pipeline()
    optimizer = create_optimizer(RUNNER_CFG)
    params = pipeline.init(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(5)
    poses, focals, images = _batch()

    # dataset of 4 items; batches of 2
    rng_np = np.random.RandomState(1)
    all_poses = np.concatenate([poses, poses], axis=0)
    all_focals = np.concatenate([focals, focals], axis=0)
    all_images = rng_np.rand(4, 8, 8, 3).astype(np.float32)
    idx_rows = [np.array([0, 1]), np.array([2, 3]), np.array([1, 2])]

    state_a = create_train_state(params, optimizer)
    step = make_train_step(pipeline, optimizer, mesh=None, donate=False)
    for row in idx_rows:
        batch = prepare_batch((all_poses[row], all_focals[row], all_images[row]), W, None)
        state_a, _ = step(state_a, batch, rng)

    mesh = create_mesh(data_parallel=2, ray_parallel=4)
    fused = make_train_step_fused(pipeline, optimizer, W, mesh=mesh, donate=False)
    state_b = create_train_state(params, optimizer)
    arrays = tuple(jnp.asarray(a) for a in (all_poses, all_focals, all_images))
    state_b, hist = fused(state_b, arrays, jnp.asarray(np.stack(idx_rows)), rng)

    assert int(state_a.step) == int(state_b.step) == 3
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params), jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_sharded_eval_with_occupancy_matches_unsharded(tmp_path):
    """Occupancy bounds are a captured constant — GSPMD must replicate the
    grid and produce identical renders under ray sharding (the multi-chip
    serving path for the round-4 empty-space skipping)."""
    from yanerf_tpu.ops.occupancy import OccupancyGrid, save_occupancy
    from yanerf_tpu.ops.structures import EvaluationMode

    # half-occupied grid so the tightening is nontrivial
    grid = np.zeros((16, 16, 16), np.uint8)
    grid[:, :, 8:] = 1
    occ = OccupancyGrid(grid=grid, aabb=np.asarray([[-3.0] * 3, [3.0] * 3], np.float32))
    path = str(tmp_path / "occ.npz")
    save_occupancy(path, occ, threshold=1.0)

    cfg = Config.fromfile(osp.join(CFG_DIR, "pipelines", "nerf_pipeline_cfg_with_mlp.py"))
    cfg.pipeline.ray_sampler.image_width = 8
    cfg.pipeline.ray_sampler.image_height = 8
    cfg.pipeline.ray_sampler.n_rays_per_image_sampled_from_mask = 8
    cfg.pipeline.ray_sampler.occupancy_grid = path
    cfg.pipeline.output_rasterized_mc = False
    pipeline = PIPELINES.build(cfg.pipeline)

    params = pipeline.init(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(3)
    eval_plain = make_eval_step(pipeline, mesh=None)
    preds1 = eval_plain(params, prepare_batch(_batch(), W, None), rng)

    mesh = create_mesh(data_parallel=1, ray_parallel=8)
    eval_sharded = make_eval_step(pipeline, mesh=mesh)
    preds2 = eval_sharded(params, prepare_batch(_batch(), W, mesh), rng)

    np.testing.assert_allclose(
        np.asarray(preds1["rendered_images"]), np.asarray(preds2["rendered_images"]),
        rtol=2e-5, atol=2e-6,
    )


def test_mesh_sizing_semantics():
    """Explicit sub-machine meshes are honored (debug/test runs); partial
    specs must cover the machine; oversubscription always errors."""
    # both axes pinned: a 1x1 mesh on an 8-device host is legitimate
    mesh = create_mesh(data_parallel=1, ray_parallel=1)
    assert mesh.devices.shape == (1, 1)
    mesh = create_mesh(data_parallel=1, ray_parallel=4)
    assert mesh.devices.shape == (1, 4)
    # one axis given: the other auto-sizes to cover all devices
    mesh = create_mesh(ray_parallel=2)
    assert mesh.devices.shape == (4, 2)
    # non-divisible partial spec errors
    with pytest.raises(ValueError, match="evenly divide"):
        create_mesh(ray_parallel=3)
    # oversubscription errors
    with pytest.raises(ValueError, match="only 8 available"):
        create_mesh(data_parallel=3, ray_parallel=4)
