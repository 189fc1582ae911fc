"""Ray sampler contract tests (mirrors reference tests/test_ray_sampler.py, widened)."""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yanerf_tpu.ops.structures import EvaluationMode
from yanerf_tpu.pipelines import RAY_SAMPLERS
from yanerf_tpu.utils import Config

CFG_DIR = osp.join(osp.dirname(__file__), "configs")


def _sampler():
    cfg = Config.fromfile(osp.join(CFG_DIR, "ray_samplers/ray_sampler.yml"))
    return RAY_SAMPLERS.build(cfg.ray_sampler)


def _cams(batch=2):
    poses = jnp.broadcast_to(jnp.eye(4), (batch, 4, 4))
    focals = jnp.full((batch, 1), 5.0)
    return poses, focals


def test_training_mode_shapes():
    sampler = _sampler()
    poses, focals = _cams()
    bundle = sampler(jax.random.PRNGKey(0), poses, focals, EvaluationMode.TRAINING)
    # (B, N, 1, .) contract: 4 rays, 5 points
    assert bundle.origins.shape == (2, 4, 1, 3)
    assert bundle.directions.shape == (2, 4, 1, 3)
    assert bundle.lengths.shape == (2, 4, 1, 5)
    assert bundle.xys.shape == (2, 4, 1, 2)
    xys = np.asarray(bundle.xys)
    assert (xys[..., 0] < 10).all() and (xys[..., 1] < 6).all()


def test_evaluation_mode_shapes():
    sampler = _sampler()
    poses, focals = _cams()
    bundle = sampler(None, poses, focals, EvaluationMode.EVALUATION)
    assert bundle.origins.shape == (2, 6, 10, 3)
    assert bundle.lengths.shape == (2, 6, 10, 5)
    z = np.asarray(bundle.lengths)
    assert np.allclose(z[0, 0, 0], np.linspace(1.0, 3.0, 5), atol=1e-6)


def test_depth_range_override():
    sampler = _sampler()
    poses, focals = _cams()
    bundle = sampler(None, poses, focals, EvaluationMode.EVALUATION, min_depth=2.0, max_depth=8.0)
    z = np.asarray(bundle.lengths)
    assert np.allclose(z[0, 0, 0], np.linspace(2.0, 8.0, 5), atol=1e-5)


def test_custom_image_size():
    sampler = _sampler()
    poses, focals = _cams()
    bundle = sampler(None, poses, focals, EvaluationMode.EVALUATION, image_height=4, image_width=8)
    assert bundle.origins.shape == (2, 4, 8, 3)
    # principal point still uses the constructor size (reference semantics)
    dirs = np.asarray(bundle.directions)
    assert np.allclose(dirs[0, 0, 0, 0], (0 - 10 * 0.5) / 5.0, atol=1e-6)


def test_mask_restricts_sampled_pixels():
    sampler = _sampler()
    poses, focals = _cams()
    # mask allows only the left half of the image (x < 5)
    mask = np.zeros((2, 1, 6, 10), dtype=np.float32)
    mask[:, :, :, :5] = 1.0
    bundle = sampler(
        jax.random.PRNGKey(0), poses, focals, EvaluationMode.TRAINING, mask=jnp.asarray(mask)
    )
    xys = np.asarray(bundle.xys)
    assert (xys[..., 0] < 5).all()


def test_sampling_prob_mask_biases_selection():
    sampler = _sampler()
    poses, focals = _cams(batch=16)
    prob = np.full((16, 6, 10), 1e-6, dtype=np.float32)
    prob[:, 2, 3] = 1000.0  # pixel (x=3, y=2) dominates
    bundle = sampler(
        jax.random.PRNGKey(1), poses, focals, EvaluationMode.TRAINING,
        sampling_prob_mask=jnp.asarray(prob), n_rays_per_image=1,
    )
    xys = np.asarray(bundle.xys).reshape(16, 2)
    hits = ((xys[:, 0] == 3) & (xys[:, 1] == 2)).mean()
    assert hits > 0.9


def test_multi_layer_sampling_prob_mask():
    sampler = _sampler()
    poses, focals = _cams()
    # two layers with separate ray budgets: layer0 -> row 0, layer1 -> row 5
    prob = np.zeros((2, 2, 6, 10), dtype=np.float32)
    prob[:, 0, 0, :] = 1.0
    prob[:, 1, 5, :] = 1.0
    bundle = sampler(
        jax.random.PRNGKey(2), poses, focals, EvaluationMode.TRAINING,
        sampling_prob_mask=jnp.asarray(prob), n_rays_per_image=[3, 2],
    )
    xys = np.asarray(bundle.xys)
    assert bundle.xys.shape == (2, 5, 1, 2)
    assert (xys[:, :3, 0, 1] == 0).all()  # first 3 rays from layer 0 (y=0)
    assert (xys[:, 3:, 0, 1] == 5).all()  # last 2 rays from layer 1 (y=5)


def test_mask_without_ray_count_raises():
    sampler = _sampler()
    sampler._raysamplers[EvaluationMode.TRAINING].n_rays_per_image = None
    poses, focals = _cams()
    mask = jnp.ones((2, 1, 6, 10))
    with pytest.raises(ValueError, match="static ray count"):
        sampler(jax.random.PRNGKey(0), poses, focals, EvaluationMode.TRAINING, mask=mask)


def test_scene_extent_auto_bounds():
    cfg = Config.fromfile(osp.join(CFG_DIR, "ray_samplers/ray_sampler.yml"))
    cfg.ray_sampler.scene_extent = 1.0
    sampler = RAY_SAMPLERS.build(cfg.ray_sampler)
    poses = jnp.broadcast_to(jnp.eye(4), (1, 4, 4)).at[:, 2, 3].set(4.0)
    focals = jnp.full((1, 1), 5.0)
    bundle = sampler(None, poses, focals, EvaluationMode.EVALUATION)
    z = np.asarray(bundle.lengths)
    assert abs(z.min() - 3.0) < 1e-4 and abs(z.max() - 5.0) < 1e-4


def test_gather_equivalence_with_sample_grid():
    # sampled xys index the image identically through sample_grid (mirrors
    # the reference's grid_sample-equivalence test).
    from yanerf_tpu.ops.sampling import sample_grid

    sampler = _sampler()
    poses, focals = _cams()
    image = jax.random.uniform(jax.random.PRNGKey(3), (2, 6, 10, 3))
    bundle = sampler(jax.random.PRNGKey(0), poses, focals, EvaluationMode.TRAINING)
    gathered = np.asarray(sample_grid(image, bundle.xys))
    xys = np.asarray(bundle.xys).astype(int)
    for b in range(2):
        for r in range(4):
            x, y = xys[b, r, 0]
            assert np.allclose(gathered[b, r, 0], np.asarray(image)[b, y, x], atol=1e-6)


def test_use_ndc_forces_unit_depth_range_and_transforms_rays():
    from yanerf_tpu.pipelines.ray_sampler import RaySampler
    from yanerf_tpu.ops.structures import EvaluationMode

    sampler = RaySampler(
        image_width=10,
        image_height=6,
        min_depth=2.0,
        max_depth=6.0,
        n_pts_per_ray_evaluation=5,
        use_ndc=True,
        ndc_near=1.0,
    )
    poses = jnp.eye(4)[None]
    poses = poses.at[0, 2, 3].set(-2.0)  # camera 2 units behind the near plane
    focals = jnp.asarray([[8.0]])
    bundle = sampler(None, poses, focals, EvaluationMode.EVALUATION)
    lengths = np.asarray(bundle.lengths)
    # NDC parameter spans [0, 1] regardless of the metric min/max depth.
    assert np.allclose(lengths.min(), 0.0) and np.allclose(lengths.max(), 1.0)
    # NDC origins sit on the z=-1 plane of the NDC cube (the near plane).
    assert np.allclose(np.asarray(bundle.origins)[..., 2], -1.0, atol=1e-5)
    assert np.isfinite(np.asarray(bundle.directions)).all()
