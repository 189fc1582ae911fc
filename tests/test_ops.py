"""Golden-value tests for the pure ops library against the reference math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yanerf_tpu import ops


def test_get_xy_grid_layout():
    grid = np.asarray(ops.get_xy_grid(3, 4))
    assert grid.shape == (3, 4, 2)
    # [..., 0] is x (column index), [..., 1] is y (row index)
    assert np.allclose(grid[0, :, 0], [0, 1, 2, 3])
    assert np.allclose(grid[:, 0, 1], [0, 1, 2])


def test_xy_to_ray_bundle_identity_pose():
    H, W, f = 4, 6, 2.0
    poses = jnp.broadcast_to(jnp.eye(3, 4), (1, 3, 4))
    xy = ops.get_xy_grid(H, W)[None]
    bundle = ops.xy_to_ray_bundle(poses, W, H, jnp.asarray([f]), xy, 1.0, 3.0, 5, False)

    assert bundle.origins.shape == (1, H, W, 3)
    assert np.allclose(np.asarray(bundle.origins), 0.0)
    dirs = np.asarray(bundle.directions)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    assert np.allclose(dirs[0, ..., 0], (xs - W * 0.5) / f, atol=1e-6)
    assert np.allclose(dirs[0, ..., 1], (ys - H * 0.5) / f, atol=1e-6)
    assert np.allclose(dirs[0, ..., 2], 1.0)
    lengths = np.asarray(bundle.lengths)
    assert lengths.shape == (1, H, W, 5)
    assert np.allclose(lengths[0, 0, 0], np.linspace(1.0, 3.0, 5), atol=1e-6)


def test_xy_to_ray_bundle_rotation_translation():
    # 90 deg rotation around z plus translation: d_world = R @ d_cam.
    R = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=np.float32)
    t = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    pose = np.concatenate([R, t[:, None]], axis=1)[None]
    xy = jnp.asarray([[[[3.0, 2.0]]]])  # x=3, y=2 — shape (1,1,1,2)
    W = H = 4
    f = 2.0
    bundle = ops.xy_to_ray_bundle(jnp.asarray(pose), W, H, jnp.asarray([f]), xy, 1.0, 2.0, 2, False)
    d_cam = np.array([(3.0 - 2.0) / f, (2.0 - 2.0) / f, 1.0])
    assert np.allclose(np.asarray(bundle.directions)[0, 0, 0], R @ d_cam, atol=1e-6)
    assert np.allclose(np.asarray(bundle.origins)[0, 0, 0], t)


def test_jiggle_within_stratas_bounds():
    rng = jax.random.PRNGKey(0)
    z = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (128, 9))
    jiggled = np.asarray(ops.jiggle_within_stratas(rng, z))
    mids = 0.5 * (np.asarray(z)[..., 1:] + np.asarray(z)[..., :-1])
    lower = np.concatenate([np.asarray(z)[..., :1], mids], -1)
    upper = np.concatenate([mids, np.asarray(z)[..., -1:]], -1)
    assert (jiggled >= lower - 1e-6).all() and (jiggled <= upper + 1e-6).all()
    # jiggled values remain sorted per-ray
    assert (np.diff(jiggled, axis=-1) >= -1e-6).all()


def test_ray_bundle_to_ray_points():
    origins = jnp.asarray([[1.0, 0.0, 0.0]])
    dirs = jnp.asarray([[0.0, 2.0, 0.0]])
    lengths = jnp.asarray([[0.5, 1.0]])
    pts = np.asarray(ops.ray_bundle_to_ray_points(origins, dirs, lengths))
    assert pts.shape == (1, 2, 3)
    assert np.allclose(pts[0, 0], [1.0, 1.0, 0.0])
    assert np.allclose(pts[0, 1], [1.0, 2.0, 0.0])


def test_harmonic_embedding_matches_reference_layout():
    x = jnp.asarray([[0.1, -0.2, 0.3]])
    out = np.asarray(ops.harmonic_embedding(x, n_harmonic_functions=2, append_input=True))
    freqs = np.array([1.0, 2.0], dtype=np.float32)
    inner = (np.asarray(x)[..., None] * freqs).reshape(1, -1)  # freq varies fastest
    expected = np.concatenate([np.sin(inner), np.cos(inner), np.asarray(x)], axis=-1)
    assert out.shape == (1, 3 * (2 * 2 + 1))
    assert np.allclose(out, expected, atol=1e-6)


def _sample_pdf_numpy(bins, weights, u, eps=1e-5):
    """Independent numpy reimplementation of the reference inverse CDF."""
    weights = weights + eps
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
    out = np.empty_like(u)
    flat_cdf = cdf.reshape(-1, cdf.shape[-1])
    flat_bins = bins.reshape(-1, bins.shape[-1])
    flat_u = u.reshape(-1, u.shape[-1])
    flat_out = out.reshape(-1, u.shape[-1])
    for i in range(flat_cdf.shape[0]):
        inds = np.searchsorted(flat_cdf[i], flat_u[i], side="right")
        below = np.clip(inds - 1, 0, flat_cdf.shape[-1] - 1)
        above = np.clip(inds, 0, flat_cdf.shape[-1] - 1)
        denom = flat_cdf[i][above] - flat_cdf[i][below]
        denom = np.where(denom < eps, 1.0, denom)
        t = (flat_u[i] - flat_cdf[i][below]) / denom
        flat_out[i] = flat_bins[i][below] + t * (flat_bins[i][above] - flat_bins[i][below])
    return out


@pytest.mark.parametrize("det", [True, False])
def test_sample_pdf_matches_numpy_reference(det):
    rng = np.random.RandomState(0)
    bins = np.sort(rng.rand(4, 17).astype(np.float32) * 4.0, axis=-1)
    weights = rng.rand(4, 16).astype(np.float32)

    n_samples = 8
    if det:
        samples = ops.sample_pdf(jnp.asarray(bins), jnp.asarray(weights), n_samples, det=True)
        u = np.broadcast_to(np.linspace(0, 1, n_samples, dtype=np.float32), (4, n_samples))
    else:
        key = jax.random.PRNGKey(3)
        samples = ops.sample_pdf(jnp.asarray(bins), jnp.asarray(weights), n_samples, rng=key)
        u = np.asarray(jax.random.uniform(key, (4, n_samples)))
    expected = _sample_pdf_numpy(bins, weights, u.astype(np.float32))
    assert np.allclose(np.asarray(samples), expected, atol=1e-5)


def test_sample_pdf_uniform_weights_det_is_linspace():
    bins = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 65), (3, 65))
    weights = jnp.ones((3, 64))
    samples = np.asarray(ops.sample_pdf(bins, weights, 33, det=True))
    assert np.allclose(samples, np.broadcast_to(np.linspace(2.0, 6.0, 33), (3, 33)), atol=1e-3)


def test_sample_pdf_concentrates_mass():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (1, 11))
    weights = jnp.zeros((1, 10)).at[0, 4].set(100.0)
    samples = np.asarray(ops.sample_pdf(bins, weights, 64, rng=jax.random.PRNGKey(0)))
    in_bin = ((samples >= 0.4) & (samples <= 0.5)).mean()
    assert in_bin > 0.95


def test_emission_absorption_analytic():
    # Two points on one ray, unit direction, known densities.
    lengths = jnp.asarray([[1.0, 2.0]])
    directions = jnp.asarray([[0.0, 0.0, 1.0]])
    sigma = np.array([0.7, 0.4], dtype=np.float32)
    densities = jnp.asarray(sigma).reshape(1, 2, 1)
    colors = jnp.asarray([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])

    features, depths, opacities, weights = ops.emission_absorption(
        densities, colors, lengths, directions, background_opacity=1e10
    )
    # deltas = [1, 1e10]; opacity_i = 1 - exp(-cumsum(delta * sigma))
    cum = np.cumsum(np.array([1.0, 1e10]) * sigma)
    rays_op = 1.0 - np.exp(-cum)
    absorption = np.array([1.0, 1.0 - rays_op[0]])
    cap = 1.0 - np.exp(-np.array([1.0, 1e10]) * sigma)
    w_expected = cap * absorption
    assert np.allclose(np.asarray(weights)[0], w_expected, atol=1e-6)
    assert np.allclose(np.asarray(opacities)[0], rays_op[-1:], atol=1e-6)
    assert np.allclose(np.asarray(depths)[0], (w_expected * np.array([1.0, 2.0])).sum(), atol=1e-6)
    feat_expected = w_expected[0] * np.array([1, 0, 0]) + w_expected[1] * np.array([0, 1, 0])
    assert np.allclose(np.asarray(features)[0], feat_expected, atol=1e-6)


def test_emission_absorption_direction_norm_scaling():
    lengths = jnp.asarray([[1.0, 1.5, 2.0]])
    densities = jnp.full((1, 3, 1), 0.5)
    colors = jnp.ones((1, 3, 3))
    _, _, _, w_unit = ops.emission_absorption(densities, colors, lengths, jnp.asarray([[0.0, 0.0, 1.0]]))
    _, _, _, w_double = ops.emission_absorption(densities, colors, lengths, jnp.asarray([[0.0, 0.0, 2.0]]))
    # doubling ||d|| doubles the effective deltas -> more absorption up front
    assert np.asarray(w_double)[0, 0] > np.asarray(w_unit)[0, 0]


def test_emission_absorption_weights_bounded():
    rng = jax.random.PRNGKey(1)
    densities = jax.random.uniform(rng, (2, 5, 16, 1)) * 5
    colors = jax.random.uniform(rng, (2, 5, 16, 3))
    lengths = jnp.broadcast_to(jnp.linspace(1.0, 4.0, 16), (2, 5, 16))
    dirs = jax.random.normal(rng, (2, 5, 3))
    _, _, _, weights = ops.emission_absorption(densities, colors, lengths, dirs)
    sums = np.asarray(jnp.sum(weights, -1))
    assert (sums <= 1.0 + 1e-5).all() and (sums >= 0.0).all()


def test_emission_absorption_background_blending():
    lengths = jnp.asarray([[1.0, 2.0]])
    directions = jnp.asarray([[0.0, 0.0, 1.0]])
    densities = jnp.zeros((1, 2, 1))
    colors = jnp.zeros((1, 2, 3))
    bg = jnp.asarray([[0.2, 0.4, 0.6]])
    features, _, opacities, _ = ops.emission_absorption(
        densities, colors, lengths, directions, bg_color=bg, background_opacity=0.0
    )
    # Zero density -> fully transparent -> pure background.
    assert np.allclose(np.asarray(opacities), 0.0, atol=1e-6)
    assert np.allclose(np.asarray(features), np.asarray(bg), atol=1e-6)


def test_emission_absorption_hard_background():
    lengths = jnp.asarray([[1.0, 2.0]])
    directions = jnp.asarray([[0.0, 0.0, 1.0]])
    densities = jnp.zeros((1, 2, 1))
    colors = jnp.zeros((1, 2, 3))
    bg = jnp.asarray([[0.5, 0.5, 0.5]])
    # With zero predicted density, the 1e10-sentinel delta only absorbs mass
    # through the background_density_bias (how lego.yml composes black bg).
    features, _, _, weights = ops.emission_absorption(
        densities, colors, lengths, directions, bg_color=bg, hard_background=True,
        background_density_bias=1e-6, background_opacity=1e10,
    )
    # Last (sentinel) sample carries all remaining weight and the bg color.
    assert np.allclose(np.asarray(weights)[0, -1], 1.0, atol=1e-4)
    assert np.allclose(np.asarray(features)[0], [0.5, 0.5, 0.5], atol=1e-4)


def test_weighted_sampling_without_replacement_unique_and_masked():
    rng = jax.random.PRNGKey(0)
    weights = jnp.ones((4, 100)).at[:, 50:].set(0.0)
    idx = np.asarray(ops.weighted_sample_without_replacement(rng, weights, 30))
    assert idx.shape == (4, 30)
    for row in idx:
        assert len(set(row.tolist())) == 30  # no replacement
        assert (row < 50).all()  # zero-weight pixels never sampled


def test_weighted_sampling_proportionality():
    # Index 0 has 10x the weight of others; it should nearly always be drawn.
    rng = jax.random.PRNGKey(0)
    weights = jnp.ones((512, 20)).at[:, 0].set(1000.0)
    idx = np.asarray(ops.weighted_sample_without_replacement(rng, weights, 1))
    assert (idx[:, 0] == 0).mean() > 0.9


def test_sample_grid_and_scatter_roundtrip():
    # Mirrors reference tests/test_pipeline_utils.py: select pixels, gather,
    # scatter back, gather again -> identical values.
    rng = jax.random.PRNGKey(0)
    B, H, W, C = 2, 6, 10, 3
    image = jax.random.uniform(rng, (B, H, W, C))
    grid = ops.get_xy_grid(H, W)[None].repeat(B, axis=0).reshape(B, -1, 2)
    sel = ops.weighted_sample_without_replacement(rng, jnp.ones((B, H * W)), 13)
    xys = jnp.take_along_axis(grid, sel[..., None], axis=1)[:, :, None]  # (B, 13, 1, 2)

    gathered = ops.sample_grid(image, xys)
    assert gathered.shape == (B, 13, 1, C)
    scattered = ops.scatter_rays_to_image(gathered, xys, H, W)
    regathered = ops.sample_grid(scattered, xys)
    assert np.allclose(np.asarray(gathered), np.asarray(regathered), atol=1e-6)


def test_metrics_analytic():
    x = jnp.asarray([[0.5, 0.5, 0.5, 0.5]])
    y = jnp.zeros((1, 4))
    mse = np.asarray(ops.calc_mse(x, y))
    assert np.allclose(mse, 0.25)
    psnr = np.asarray(ops.calc_psnr(x, y))
    assert np.allclose(psnr, -10 * np.log10(0.25), atol=1e-4)
    hub = np.asarray(ops.huber(jnp.asarray([0.0]), scaling=0.03))
    assert abs(hub[0] - ((np.sqrt(1 + 1e-4) - 1) * 0.03)) < 1e-7


def test_eval_depth_best_scale_recovery():
    rng = jax.random.PRNGKey(0)
    gt = jax.random.uniform(rng, (2, 8, 8, 1)) + 0.5
    pred = gt * 2.0  # off by a global scale
    mse, abs_err = ops.eval_depth(pred, gt, crop=0, get_best_scale=True)
    assert np.asarray(mse).max() < 1e-10
    assert np.asarray(abs_err).max() < 1e-5


def test_view_metrics_full_grid_identity():
    rng = jax.random.PRNGKey(0)
    B, H, W = 2, 4, 5
    img = jax.random.uniform(rng, (B, H, W, 3))
    xys = ops.get_xy_grid(H, W)[None].repeat(B, axis=0)
    metrics = ops.view_metrics(xys, images=img, images_pred=img)
    assert np.allclose(np.asarray(metrics["loss_rgb_mse"]), 0.0, atol=1e-8)
    assert metrics["loss_rgb_mse"].shape == (B,)


def test_get_min_max_depth_bounds():
    # camera at distance 4 from origin along z, extent 1 -> near 3, far 5
    pose = np.eye(3, 4, dtype=np.float32)
    pose[2, 3] = 4.0
    poses = jnp.asarray(pose)[None]
    near, far = ops.get_min_max_depth_bounds(poses, jnp.zeros(3), 1.0)
    assert abs(float(near) - 3.0) < 1e-5
    assert abs(float(far) - 5.0) < 1e-5


def test_emission_absorption_cap1_and_minimum_variants():
    lengths = jnp.asarray([[1.0, 2.0, 3.0]])
    directions = jnp.asarray([[0.0, 0.0, 1.0]])
    sigma = np.array([0.4, 0.8, 0.3], dtype=np.float32)
    densities = jnp.asarray(sigma).reshape(1, 3, 1)
    colors = jnp.ones((1, 3, 3))

    feats, _, _, weights = ops.emission_absorption(
        densities, colors, lengths, directions,
        capping_function="cap1", weight_function="minimum", background_opacity=1.0,
    )
    # cap1: opacity = min(cumsum(delta*sigma), 1); weights = min(capped, shifted-absorption)
    deltas = np.array([1.0, 1.0, 1.0])
    capped = np.minimum(deltas * sigma, 1.0)
    rays_op = np.minimum(np.cumsum(deltas * sigma), 1.0)
    absorption = np.concatenate([[1.0], 1.0 - rays_op[:-1]])
    expected = np.minimum(capped, absorption)
    assert np.allclose(np.asarray(weights)[0], expected, atol=1e-6)


def test_emission_absorption_blend_output():
    lengths = jnp.asarray([[1.0, 2.0]])
    directions = jnp.asarray([[0.0, 0.0, 1.0]])
    densities = jnp.asarray([[0.5], [0.0]]).reshape(1, 2, 1)
    colors = jnp.ones((1, 2, 3))
    bg = jnp.asarray([[0.0, 0.0, 0.0]])
    soft, _, op, w = ops.emission_absorption(
        densities, colors, lengths, directions, bg_color=bg, blend_output=True, background_opacity=0.0
    )
    # blend_output: features = opacity * sum(w*c) + (1-op)*bg
    expected = np.asarray(op) * np.asarray(w).sum() * 1.0
    assert np.allclose(np.asarray(soft)[0, 0], expected[0, 0], atol=1e-5)


def test_ndc_ray_bundle_matches_perspective_projection():
    """A point at parameter t on the world ray must land at the NDC-projected
    location at parameter t' = 1 - oz/(oz + t*dz) on the NDC ray."""
    W, H, near = 8, 6, 1.0
    focal = jnp.asarray([[5.0]])
    poses = jnp.eye(4)[None, :3, :4]  # camera at origin, +z forward
    grid = jnp.broadcast_to(ops.get_xy_grid(H, W), (1, H, W, 2))
    bundle = ops.xy_to_ray_bundle(poses, W, H, focal, grid, 0.0, 1.0, 4)
    ndc = ops.ndc_ray_bundle(bundle, W, H, focal, near=near)

    # Origins advanced to the near plane, then projected.
    o_adv = np.asarray(bundle.origins) + (
        (near - np.asarray(bundle.origins)[..., 2:3]) / np.asarray(bundle.directions)[..., 2:3]
    ) * np.asarray(bundle.directions)
    d = np.asarray(bundle.directions)

    for t_prime in (0.0, 0.3, 0.8):
        # invert t' = 1 - oz/(oz + t*dz)
        t = o_adv[..., 2] * t_prime / ((1.0 - t_prime) * d[..., 2])
        p = o_adv + t[..., None] * d
        fx, fy = 2 * 5.0 / W, 2 * 5.0 / H
        expected = np.stack(
            [fx * p[..., 0] / p[..., 2], fy * p[..., 1] / p[..., 2], 1 - 2 * near / p[..., 2]],
            axis=-1,
        )
        got = np.asarray(ndc.origins) + t_prime * np.asarray(ndc.directions)
        assert np.allclose(got, expected, atol=1e-5), (t_prime, np.abs(got - expected).max())

    # t' -> 1 converges to the vanishing point (d_x/d_z scaled), i.e. finite.
    at_inf = np.asarray(ndc.origins) + 1.0 * np.asarray(ndc.directions)
    assert np.isfinite(at_inf).all()
    assert np.allclose(at_inf[..., 2], 1.0, atol=1e-6)


def test_ndc_ray_bundle_handles_minus_z_facing_rays():
    """The recentered LLFF world frame faces -z; the warp must mirror, not
    advance rays backward (the bug the first synth_llff_ndc training run
    exposed: near-plane advance with t_near < 0 behind the cameras)."""
    W, H, near = 8, 6, 1.0
    focal = jnp.asarray([[5.0]])
    # camera at origin looking down -z: pose flips y and z (CAM_CALIBRATION),
    # exactly what LLFFDataset.__getitem__ produces for the average camera
    pose = jnp.diag(jnp.asarray([1.0, -1.0, -1.0]))[None]
    poses = jnp.concatenate([pose, jnp.zeros((1, 3, 1))], axis=-1)
    grid = jnp.broadcast_to(ops.get_xy_grid(H, W), (1, H, W, 2))
    bundle = ops.xy_to_ray_bundle(poses, W, H, focal, grid, 0.0, 1.0, 4)
    assert float(np.asarray(bundle.directions)[..., 2].mean()) < 0  # -z facing

    ndc = ops.ndc_ray_bundle(bundle, W, H, focal, near=near)
    o, d = np.asarray(ndc.origins), np.asarray(ndc.directions)
    # near plane at t'=0 maps to z=-1; t'=1 (infinity) to z=+1; all finite
    assert np.allclose(o[..., 2], -1.0, atol=1e-5)
    assert np.allclose(o[..., 2] + d[..., 2], 1.0, atol=1e-5)
    assert np.isfinite(o).all() and np.isfinite(d).all()

    # mirror equivalence: flipping the world z of rays flips only NDC-z sign
    flipped = ops.RayBundle(
        origins=bundle.origins * jnp.asarray([1.0, 1.0, -1.0]),
        directions=bundle.directions * jnp.asarray([1.0, 1.0, -1.0]),
        lengths=bundle.lengths,
        xys=bundle.xys,
    )
    ndc_flipped = ops.ndc_ray_bundle(flipped, W, H, focal, near=near)
    np.testing.assert_allclose(np.asarray(ndc_flipped.origins), o, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ndc_flipped.directions), d, atol=1e-5)


def test_weighted_sample_with_replacement_distribution():
    """Inverse-CDF replacement sampling follows the weights and respects
    zero-weight exclusion (the cheap throughput alternative to Gumbel
    top-k; ops/sampling.py)."""
    from yanerf_tpu.ops.sampling import weighted_sample_with_replacement

    w = jnp.asarray([[0.0, 1.0, 3.0, 0.0, 1.0]])
    idx = weighted_sample_with_replacement(jax.random.PRNGKey(0), w, 4000)
    assert idx.shape == (1, 4000)
    counts = np.bincount(np.asarray(idx[0]), minlength=5)
    assert counts[0] == 0 and counts[3] == 0  # zero-weight never sampled
    np.testing.assert_allclose(counts[2] / counts[1], 3.0, rtol=0.25)
    np.testing.assert_allclose(counts[4] / counts[1], 1.0, rtol=0.25)

    # uniform rows cover the domain roughly evenly
    wu = jnp.ones((2, 64))
    idxu = weighted_sample_with_replacement(jax.random.PRNGKey(1), wu, 2000)
    for row in np.asarray(idxu):
        assert len(np.unique(row)) > 55


def test_uniform_sample_with_replacement_bounds_and_coverage():
    """The no-mask randint fast path (ray_sampler.pixel_replacement)."""
    from yanerf_tpu.ops.sampling import uniform_sample_with_replacement

    idx = uniform_sample_with_replacement(jax.random.PRNGKey(0), 3, 64, 2000)
    assert idx.shape == (3, 2000) and idx.dtype == jnp.int32
    arr = np.asarray(idx)
    assert arr.min() >= 0 and arr.max() < 64
    for row in arr:
        assert len(np.unique(row)) > 55  # covers the domain
    # rows are independent draws
    assert not np.array_equal(arr[0], arr[1])


def test_calc_ssim_properties():
    from yanerf_tpu.ops.metrics import calc_ssim

    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    np.testing.assert_allclose(np.asarray(calc_ssim(x, x)), 1.0, atol=1e-5)

    noisy = jnp.clip(x + 0.2 * jax.random.normal(jax.random.PRNGKey(1), x.shape), 0, 1)
    s_noisy = np.asarray(calc_ssim(x, noisy))
    assert (s_noisy < 0.95).all() and (s_noisy > 0.0).all()

    # invariant to a common luminance shift up to the C terms; sensitive to
    # structure destruction (shuffled pixels score far lower)
    perm = jax.random.permutation(jax.random.PRNGKey(2), 32 * 32)
    shuffled = x.reshape(2, -1, 3)[:, perm].reshape(x.shape)
    assert np.asarray(calc_ssim(x, shuffled)).max() < 0.2


def _ssim_numpy_reference(x, y, filter_size=11, filter_sigma=1.5, k1=0.01, k2=0.03):
    """Float64 Wang et al. 2004 SSIM with exact separable Gaussian windows."""
    off = np.arange(filter_size, dtype=np.float64) - filter_size // 2
    k = np.exp(-0.5 * (off / filter_sigma) ** 2)
    k /= k.sum()

    def blur(img):  # (B,H,W,C), VALID
        out = np.apply_along_axis(lambda r: np.convolve(r, k, mode="valid"), 2, img)
        return np.apply_along_axis(lambda c_: np.convolve(c_, k, mode="valid"), 1, out)

    x = x.astype(np.float64)
    y = y.astype(np.float64)
    mu_x, mu_y = blur(x), blur(y)
    s_xx = blur(x * x) - mu_x**2
    s_yy = blur(y * y) - mu_y**2
    s_xy = blur(x * y) - mu_x * mu_y
    c1, c2 = k1**2, k2**2
    ssim_map = ((2 * mu_x * mu_y + c1) * (2 * s_xy + c2)) / (
        (mu_x**2 + mu_y**2 + c1) * (s_xx + s_yy + c2)
    )
    return ssim_map.mean(axis=(1, 2, 3))


def test_calc_ssim_matches_numpy_reference_and_is_bounded():
    """Regression for the TPU conv-precision bug: with default (bf16-operand)
    conv precision, the windowed variances ``blur(x*x) - mu**2`` cancel
    catastrophically on flat image regions, and real eval frames logged
    "SSIM" up to 4.3. calc_ssim pins ``Precision.HIGHEST``; this test pins
    the math against a float64 numpy reference on exactly that adversarial
    content (a flat near-1.0 background), plus the |SSIM| <= 1 bound that
    the broken precision violates.
    """
    from yanerf_tpu.ops.metrics import calc_ssim

    rng = np.random.default_rng(0)
    # white background + object patch, tiny noise: flat regions make the
    # variance cancellation maximally ill-conditioned
    gt = np.ones((1, 64, 64, 3), np.float32)
    gt[0, 24:40, 24:40] = 0.3
    pred = np.clip(gt + rng.normal(0, 0.005, gt.shape), 0, 1).astype(np.float32)

    ours = np.asarray(calc_ssim(jnp.asarray(pred), jnp.asarray(gt)))
    ref = _ssim_numpy_reference(pred, gt)
    np.testing.assert_allclose(ours, ref, atol=5e-4)
    assert (np.abs(ours) <= 1.0 + 1e-4).all()

    # and on generic content
    x = rng.random((2, 48, 48, 3)).astype(np.float32)
    yv = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)
    ours = np.asarray(calc_ssim(jnp.asarray(x), jnp.asarray(yv)))
    ref = _ssim_numpy_reference(x, yv)
    np.testing.assert_allclose(ours, ref, atol=5e-4)
    assert (np.abs(ours) <= 1.0 + 1e-4).all()


def test_sample_pdf_empty_tail_bin_matches_searchsorted_reference():
    """u == 1.0 (always present with det=True) must land on the TOP edge
    even when the last bin is (near-)empty — searchsorted-right + clip
    semantics (reference renderers/utils.py:83-158)."""
    import numpy as np

    from yanerf_tpu.ops.sample_pdf import sample_pdf

    n_bins = 64
    bins = jnp.linspace(2.0, 6.0, n_bins + 1)[None, :].repeat(8, axis=0)
    w = np.zeros((8, n_bins), np.float32)
    w[:, : n_bins // 2] = np.random.RandomState(0).rand(8, n_bins // 2)  # empty tail
    samples = np.asarray(sample_pdf(bins, jnp.asarray(w), 16, det=True))

    # numpy searchsorted reference (same eps regularization)
    eps = 1e-5
    # strict float32 throughout: the op's CDF is f32, and inside the
    # eps-wide plateau of the empty tail an f64 reference lands u in a
    # different plateau bin (one bin width apart) purely by rounding
    wr = (w + np.float32(eps)).astype(np.float32)
    pdf = (wr / wr.sum(-1, keepdims=True, dtype=np.float32)).astype(np.float32)
    cdf = np.concatenate([np.zeros((8, 1), np.float32),
                          np.cumsum(pdf, -1, dtype=np.float32)], -1)
    u = np.linspace(0.0, 1.0, 16, dtype=np.float32)
    ref = np.empty((8, 16), np.float32)
    b = np.asarray(bins)
    for i in range(8):
        inds = np.searchsorted(cdf[i], u, side="right")
        below = np.clip(inds - 1, 0, n_bins)
        above = np.clip(inds, 0, n_bins)
        c0, c1 = cdf[i][below], cdf[i][above]
        denom = np.where((c1 - c0) < eps, 1.0, c1 - c0)
        t = (u - c0) / denom
        ref[i] = b[i][below] + t * (b[i][above] - b[i][below])
    # interior samples match the searchsorted reference; the final u == 1.0
    # is compared against the exact-math semantic (top edge) directly — an
    # f32 emulation of searchsorted flips on whether cumsum overshoots 1.0
    np.testing.assert_allclose(samples[:, :-1], ref[:, :-1], atol=2e-4)
    np.testing.assert_allclose(samples[:, -1], 6.0)  # top edge, not one bin low


def test_sample_pdf_negative_weights_clamped_in_range():
    """The reference raises on negative weights; under jit we clamp — the
    CDF stays monotone and samples stay inside the bin range."""
    import numpy as np

    from yanerf_tpu.ops.sample_pdf import sample_pdf

    bins = jnp.linspace(2.0, 6.0, 17)[None]
    w = np.ones((1, 16), np.float32)
    w[0, 5:9] = -3.0  # a negative band
    s = np.asarray(sample_pdf(bins, jnp.asarray(w), 32, det=True))
    assert s.min() >= 2.0 - 1e-5 and s.max() <= 6.0 + 1e-5
    # identical to explicitly clamped input
    s2 = np.asarray(sample_pdf(bins, jnp.asarray(np.maximum(w, 0.0)), 32, det=True))
    np.testing.assert_array_equal(s, s2)


def test_hard_background_broadcasts_single_channel_bg():
    from yanerf_tpu.ops.raymarch import emission_absorption

    dens = jnp.ones((4, 8, 1)) * 0.0  # empty ray -> pure background
    feats = jnp.ones((4, 8, 3)) * 0.25
    lengths = jnp.broadcast_to(jnp.linspace(1.0, 3.0, 8), (4, 8))
    dirs = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (4, 3))
    features, depths, op, wts = emission_absorption(
        dens, feats, ray_lengths=lengths, ray_directions=dirs,
        default_bg_color=(0.5,), hard_background=True,
        background_density_bias=1e-6,  # saturate the sentinel so bg shows
    )
    assert features.shape == (4, 3)
    np.testing.assert_allclose(np.asarray(features), 0.5, atol=1e-5)


def test_density_activation_softplus_matches_manual():
    # softplus(raw + pre_bias) + bg_bias substituted into the same
    # compositing math as the relu default (mip-NeRF density activation).
    lengths = jnp.asarray([[1.0, 2.0, 3.0]])
    dirs = jnp.asarray([[0.0, 0.0, 1.0]])
    raw = np.array([-0.5, 0.3, 1.2], dtype=np.float32)
    dens = jnp.asarray(raw).reshape(1, 3, 1)

    w_sp, op_sp = ops.emission_absorption_weights(
        dens, lengths, dirs,
        density_activation="softplus", density_pre_activation_bias=-1.0,
        background_density_bias=1e-6,
    )
    sigma = np.log1p(np.exp(raw - 1.0)) + 1e-6
    wd = np.array([1.0, 1.0, 1e10]) * sigma
    rays_op = 1.0 - np.exp(-np.cumsum(wd))
    absorption = np.concatenate([[1.0], 1.0 - rays_op[:-1]])
    expected = (1.0 - np.exp(-wd)) * absorption
    np.testing.assert_allclose(np.asarray(w_sp)[0], expected, atol=1e-6)
    np.testing.assert_allclose(np.asarray(op_sp)[0], rays_op[-1:], atol=1e-6)


def test_density_activation_backcompat_with_density_relu():
    # density_activation=None defers to the boolean; explicit names match
    # the historical paths bit-exactly (incl. "none" skipping the bias).
    lengths = jnp.broadcast_to(jnp.linspace(1.0, 3.0, 5), (2, 5))
    dirs = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (2, 3))
    dens = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 5, 1)).astype(np.float32)
    )
    for relu_flag, name in [(True, "relu"), (False, "none")]:
        w_old, op_old = ops.emission_absorption_weights(
            dens, lengths, dirs, density_relu=relu_flag,
            background_density_bias=1e-6,
        )
        w_new, op_new = ops.emission_absorption_weights(
            dens, lengths, dirs, density_activation=name,
            background_density_bias=1e-6,
        )
        np.testing.assert_array_equal(np.asarray(w_old), np.asarray(w_new))
        np.testing.assert_array_equal(np.asarray(op_old), np.asarray(op_new))


def test_density_activation_unknown_name_raises():
    lengths = jnp.asarray([[1.0, 2.0]])
    dirs = jnp.asarray([[0.0, 0.0, 1.0]])
    dens = jnp.ones((1, 2, 1))
    with pytest.raises(ValueError, match="density_activation"):
        ops.emission_absorption_weights(dens, lengths, dirs, density_activation="gelu")
