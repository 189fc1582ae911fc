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


# ---- per-ray AABB depth tightening (ops/rays.py::ray_aabb_bounds) ----


def test_ray_aabb_bounds_analytic():
    from yanerf_tpu.ops.rays import ray_aabb_bounds

    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    origins = jnp.asarray(
        [
            [0.0, 0.0, -4.0],   # hits the box straight on: t in [3, 5]
            [3.0, 0.0, -4.0],   # misses (x offset outside)
            [0.0, 0.0, 0.0],    # starts inside: clamps to min_depth
            [0.0, 0.0, -4.0],   # parallel slabs (dx=dy=0), inside both
        ]
    )
    directions = jnp.asarray(
        [[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [0.0, 0.0, 1.0]]
    )
    t0, t1 = ray_aabb_bounds(origins, directions, aabb, 0.1, 10.0)
    np.testing.assert_allclose(t0, [3.0, 10.0, 0.1, 3.0], atol=1e-5)
    np.testing.assert_allclose(t1, [5.0, 10.0, 1.0, 5.0], atol=1e-5)

    # unnormalized directions: doubling |d| halves the t interval (the
    # lengths parameterization carries the direction norm)
    t0s, t1s = ray_aabb_bounds(origins[:1], directions[:1] * 2.0, aabb, 0.1, 10.0)
    np.testing.assert_allclose([t0s[0], t1s[0]], [1.5, 2.5], atol=1e-5)

    # parallel slab with origin OUTSIDE the slab -> miss
    t0m, t1m = ray_aabb_bounds(
        jnp.asarray([[2.0, 0.0, -4.0]]), jnp.asarray([[0.0, 0.0, 1.0]]), aabb, 0.1, 10.0
    )
    assert float(t0m[0]) == 10.0 and float(t1m[0]) == 10.0


def test_ray_aabb_bounds_matches_brute_force():
    from yanerf_tpu.ops.rays import ray_aabb_bounds

    rng = np.random.RandomState(0)
    aabb = jnp.asarray([[-0.8, -0.5, -1.2], [0.7, 1.1, 0.4]])
    origins = jnp.asarray(rng.uniform(-3, 3, (64, 3)).astype(np.float32))
    directions = jnp.asarray(rng.uniform(-1, 1, (64, 3)).astype(np.float32))
    t0, t1 = ray_aabb_bounds(origins, directions, aabb, 0.05, 8.0)
    # dense scan of the interval [min_depth, max_depth]
    ts = np.linspace(0.05, 8.0, 4001, dtype=np.float32)
    pts = np.asarray(origins)[:, None, :] + ts[None, :, None] * np.asarray(directions)[:, None, :]
    inside = ((pts >= np.asarray(aabb[0])) & (pts <= np.asarray(aabb[1]))).all(-1)
    for i in range(64):
        if inside[i].any():
            lo_ref, hi_ref = ts[inside[i]][0], ts[inside[i]][-1]
            assert float(t0[i]) <= lo_ref + 1e-2
            assert float(t1[i]) >= hi_ref - 1e-2
            # and not wastefully loose
            assert float(t0[i]) >= lo_ref - 1e-2
            assert float(t1[i]) <= hi_ref + 1e-2
        else:
            # brute force found nothing; op must report miss or a sliver
            # shorter than the scan resolution
            assert float(t1[i]) - float(t0[i]) <= 2e-3


def test_sampler_scene_aabb_tightens_lengths():
    cfg = Config.fromfile(osp.join(CFG_DIR, "ray_samplers/ray_sampler.yml"))
    cfg.ray_sampler.scene_aabb = [-0.5, -0.5, 2.0, 0.5, 0.5, 3.0]
    cfg.ray_sampler.n_pts_per_ray_evaluation = 16
    sampler = RAY_SAMPLERS.build(cfg.ray_sampler)
    poses, focals = _cams()
    bundle = sampler(None, poses, focals, EvaluationMode.EVALUATION, min_depth=0.1, max_depth=10.0)
    lengths = np.asarray(bundle.lengths)
    origins = np.asarray(bundle.origins)
    dirs = np.asarray(bundle.directions)
    pts = origins[..., None, :] + lengths[..., :, None] * dirs[..., None, :]
    aabb_lo, aabb_hi = np.array([-0.5, -0.5, 2.0]), np.array([0.5, 0.5, 3.0])
    hit = ((pts >= aabb_lo - 1e-4) & (pts <= aabb_hi + 1e-4)).all(-1).all(-1)
    missed = ~hit
    # identity poses look down +z from the origin: the center pixels hit
    assert hit.any()
    # every sample on a hitting ray is inside the box; missing rays
    # collapse to the far plane
    assert np.allclose(lengths[missed], 10.0)
    # untightened lengths span [0.1, 10]; tightened hitting rays span ~[2, 3]
    assert lengths[hit].min() >= 2.0 - 1e-4 and lengths[hit].max() <= 3.0 + 1e-4


def test_sampler_scene_aabb_validation():
    cfg = Config.fromfile(osp.join(CFG_DIR, "ray_samplers/ray_sampler.yml"))
    cfg.ray_sampler.scene_aabb = [-1.0, -1.0, -1.0, 1.0, 1.0, 1.0]
    cfg.ray_sampler.use_ndc = True
    with pytest.raises(ValueError, match="NDC"):
        RAY_SAMPLERS.build(cfg.ray_sampler)
    cfg.ray_sampler.use_ndc = False
    cfg.ray_sampler.scene_aabb = [1.0, -1.0, -1.0, -1.0, 1.0, 1.0]
    with pytest.raises(ValueError, match="min < max"):
        RAY_SAMPLERS.build(cfg.ray_sampler)


def test_fit_scene_aabb_sphere():
    from yanerf_tpu.ops.mesh import fit_scene_aabb

    n, r, lo, hi = 65, 0.6, -1.5, 1.5
    axis = np.linspace(lo, hi, n)
    x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
    grid = np.where(np.sqrt(x * x + y * y + z * z) < r, 30.0, 0.0)
    aabb = fit_scene_aabb(grid, (lo, hi), threshold=5.0, margin=0.0)
    spacing = (hi - lo) / (n - 1)
    # the fitted box brackets the sphere within one lattice spacing + pad
    np.testing.assert_allclose(aabb[0], [-r - spacing] * 3, atol=spacing)
    np.testing.assert_allclose(aabb[1], [r + spacing] * 3, atol=spacing)
    with pytest.raises(ValueError, match="no density"):
        fit_scene_aabb(grid, (lo, hi), threshold=100.0)


def test_sampler_scene_aabb_eval_only():
    """scene_aabb_eval_only applies the box at EVALUATION but leaves the
    TRAINING half untightened (ships the measured eval win without touching
    the training recipe; results/aabb_eval.json)."""
    cfg = Config.fromfile(osp.join(CFG_DIR, "ray_samplers/ray_sampler.yml"))
    cfg.ray_sampler.scene_aabb = [-0.5, -0.5, 2.0, 0.5, 0.5, 3.0]
    cfg.ray_sampler.scene_aabb_eval_only = True
    cfg.ray_sampler.n_pts_per_ray_training = 16
    cfg.ray_sampler.n_pts_per_ray_evaluation = 16
    sampler = RAY_SAMPLERS.build(cfg.ray_sampler)
    poses, focals = _cams()
    import jax

    train_bundle = sampler(
        jax.random.PRNGKey(0), poses, focals, EvaluationMode.TRAINING,
        min_depth=0.1, max_depth=10.0,
    )
    train_lengths = np.asarray(train_bundle.lengths)
    # training half untightened: depth samples span the full [0.1, 10] range
    assert train_lengths.min() < 1.0
    eval_bundle = sampler(None, poses, focals, EvaluationMode.EVALUATION, min_depth=0.1, max_depth=10.0)
    eval_lengths = np.asarray(eval_bundle.lengths)
    # eval half tightened: every sample either inside ~[2, 3] or collapsed
    # to the far plane (miss)
    inside = (eval_lengths >= 2.0 - 1e-4) & (eval_lengths <= 3.0 + 1e-4)
    misses = np.isclose(eval_lengths, 10.0)
    assert (inside | misses).all()
    assert inside.any()


def test_pixel_selection_and_depth_jitter_use_independent_streams():
    """The MC pixel-selection key and the stratified depth-jitter key must
    be independent: reusing one key couples a ray's pixel index to its
    depth jitter deterministically every step (Threefry bits are a pure
    function of the key)."""
    from yanerf_tpu.ops.rays import jiggle_within_stratas

    cfg = Config.fromfile(osp.join(CFG_DIR, "ray_samplers/ray_sampler.yml"))
    cfg.ray_sampler.stratified_point_sampling_training = True
    sampler = RAY_SAMPLERS.build(cfg.ray_sampler)
    poses, focals = _cams()
    rng = jax.random.PRNGKey(9)
    bundle = sampler(rng, poses, focals, EvaluationMode.TRAINING)

    # reconstruct what the OLD key-reuse behavior would have produced:
    # jiggle with the top-level key on the deterministic bin centers
    cfg.ray_sampler.stratified_point_sampling_training = False
    det = RAY_SAMPLERS.build(cfg.ray_sampler)(rng, poses, focals, EvaluationMode.TRAINING)
    reused = jiggle_within_stratas(rng, det.lengths)
    assert not np.allclose(np.asarray(bundle.lengths), np.asarray(reused)), (
        "depth jitter still drawn with the pixel-selection key"
    )
    # same selection key -> same pixels regardless of the depth stream
    np.testing.assert_array_equal(np.asarray(bundle.xys), np.asarray(det.xys))


def test_list_ray_count_without_multilayer_mask_raises_clearly():
    sampler = _sampler()
    poses, focals = _cams()
    with pytest.raises(ValueError, match="multi-layer sampling_prob_mask"):
        sampler(jax.random.PRNGKey(0), poses, focals, EvaluationMode.TRAINING,
                n_rays_per_image=[4, 4])
