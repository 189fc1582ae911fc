"""mip-NeRF family: IPE math golden properties + pipeline integration.

Covers ops/mip.py (intervals, conical frustum moments, integrated
embedding) and models/mip_nerf.py (drop-in contract, NeRFMLP param
compatibility, gradient flow through both renderer families).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yanerf_tpu.models import MipNeRFMLP, NeRFMLP
from yanerf_tpu.ops.harmonics import harmonic_embedding
from yanerf_tpu.ops.mip import (
    conical_frustum_to_gaussian,
    integrated_harmonic_embedding,
    intervals_from_midpoints,
)


def test_intervals_from_midpoints_uniform():
    t = jnp.linspace(2.0, 6.0, 9)[None]  # spacing 0.5
    t0, t1 = intervals_from_midpoints(t)
    np.testing.assert_allclose(np.asarray(t1 - t0), 0.5, rtol=1e-6)
    # centred on the samples, contiguous, ordered
    np.testing.assert_allclose(np.asarray(0.5 * (t0 + t1)), np.asarray(t), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(t0[..., 1:]), np.asarray(t1[..., :-1]), rtol=1e-6)


def test_conical_frustum_moments():
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t0 = jnp.asarray([[2.0, 3.0]])
    t1 = jnp.asarray([[3.0, 4.0]])
    mean, var = conical_frustum_to_gaussian(o, d, t0, t1, base_radius=1e-3)
    assert mean.shape == (1, 2, 3) and var.shape == (1, 2, 3)
    # mean depth inside the interval, slightly past the midpoint (cone widens)
    z = np.asarray(mean[0, :, 2])
    assert np.all(z > np.asarray(t0[0])) and np.all(z < np.asarray(t1[0]))
    assert np.all(z > np.asarray(0.5 * (t0 + t1))[0])
    v = np.asarray(var)
    assert np.all(v > 0.0)
    # along-ray variance ~ (width/2)^2/3; radial variance ~ (r t)^2 scale
    np.testing.assert_allclose(v[0, :, 2], 0.25 / 3.0, rtol=0.2)
    assert np.all(v[0, :, 0] < 1e-4)  # tiny radius -> tiny radial var

    # shrinking the interval collapses onto the point sample
    eps = 1e-4
    mean_s, var_s = conical_frustum_to_gaussian(
        o, d, jnp.asarray([[2.5 - eps]]), jnp.asarray([[2.5 + eps]]), base_radius=1e-3
    )
    np.testing.assert_allclose(np.asarray(mean_s[0, 0]), [0.0, 0.0, 2.5], atol=1e-5)
    assert float(var_s[0, 0, 2]) < 1e-7


def test_integrated_embedding_zero_var_matches_point_embedding():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 5, 3))
    for append in (True, False):
        ipe = integrated_harmonic_embedding(x, jnp.zeros_like(x), 6, append_input=append)
        pe = harmonic_embedding(x, 6, append_input=append)
        np.testing.assert_allclose(np.asarray(ipe), np.asarray(pe), atol=1e-6)


def test_integrated_embedding_attenuates_high_frequencies():
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 3))
    var = jnp.full_like(x, 0.05)
    ipe = integrated_harmonic_embedding(x, var, 8, append_input=False)
    sin_block = np.asarray(ipe[..., : 3 * 8]).reshape(64, 3, 8)
    # mean |sin component| decreases with frequency (exp(-f^2 var / 2))
    mags = np.abs(sin_block).mean(axis=(0, 1))
    assert mags[0] > mags[4] > mags[7]
    assert mags[7] < 1e-3  # f=128: annihilated at this footprint


def _bundle(rng, n_pts=8):
    k1, k2 = jax.random.split(rng)
    origins = jax.random.normal(k1, (2, 16, 1, 3))
    directions = jax.random.normal(k2, (2, 16, 1, 3))
    lengths = jnp.broadcast_to(jnp.linspace(2.0, 6.0, n_pts), (2, 16, 1, n_pts))
    return origins, directions, lengths


def test_mip_nerf_contract_and_param_compat():
    kwargs = dict(
        n_layers=2, input_skips=[1], n_harmonic_functions_xyz=4,
        n_harmonic_functions_dir=2, n_hidden_neurons_xyz=16, n_hidden_neurons_dir=8,
        latent_dim=0, color_dim=3,
    )
    mip = MipNeRFMLP(base_radius=6e-4, **kwargs)
    point = NeRFMLP(**kwargs)
    params = mip.init(jax.random.PRNGKey(0))
    # identical param pytree structure -> checkpoints interchangeable
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        point.init(jax.random.PRNGKey(0))
    )
    o, d, t = _bundle(jax.random.PRNGKey(2))
    out = mip.apply(params, o, d, t)
    assert out["rays_densities"].shape == (2, 16, 1, 8, 1)
    assert out["rays_features"].shape == (2, 16, 1, 8, 3)
    assert np.all(np.isfinite(np.asarray(out["rays_densities"])))
    # same params through the point model: IPE damping must make outputs
    # differ (i.e. the cone is actually being used)
    out_pt = point.apply(params, o, d, t)
    assert float(jnp.abs(out["rays_densities"] - out_pt["rays_densities"]).max()) > 1e-6

    with pytest.raises(ValueError):
        MipNeRFMLP(base_radius=0.0, **kwargs)
    with pytest.raises(ValueError):
        MipNeRFMLP(base_radius=1e-3, contract_coords=True, **kwargs)


def test_mip_nerf_gradient_flow():
    mip = MipNeRFMLP(
        base_radius=6e-4, n_layers=2, input_skips=[1], n_harmonic_functions_xyz=3,
        n_harmonic_functions_dir=2, n_hidden_neurons_xyz=16, n_hidden_neurons_dir=8,
    )
    params = mip.init(jax.random.PRNGKey(0))
    o, d, t = _bundle(jax.random.PRNGKey(1), n_pts=4)

    def loss(p):
        out = mip.apply(p, o, d, t)
        return jnp.mean(out["rays_features"] ** 2) + jnp.mean(out["rays_densities"] ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


@pytest.mark.slow
def test_mip_nerf_in_pipeline():
    from yanerf_tpu.ops.structures import EvaluationMode
    from yanerf_tpu.pipelines import PIPELINES

    cfg = dict(
        type="NeRFPipeline",
        chunk_size_grid=512,
        num_passes=2,
        output_rasterized_mc=False,
        loss_weights={"loss_rgb_mse": 1.0, "loss_prev_stage_rgb_mse": 1.0},
        model=dict(
            type="MipNeRFMLP", base_radius=6e-4, n_layers=2, input_skips=[1],
            n_harmonic_functions_xyz=3, n_harmonic_functions_dir=2,
            n_hidden_neurons_xyz=16, n_hidden_neurons_dir=8, latent_dim=0, color_dim=3,
        ),
        ray_sampler=dict(
            type="RaySampler", image_height=8, image_width=8, min_depth=2.0, max_depth=6.0,
            n_pts_per_ray_training=6, n_pts_per_ray_evaluation=6,
            n_rays_per_image_sampled_from_mask=16,
        ),
        renderer=dict(
            type="MultipassEmissionAbsorpsionRenderer",
            n_pts_per_ray_fine_training=6, n_pts_per_ray_fine_evaluation=6,
            bg_color=[0.0, 0.0, 0.0], density_noise_std_train=0.0,
        ),
        feature_extractor=[],
    )
    pipeline = PIPELINES.build(cfg)
    params = pipeline.init(jax.random.PRNGKey(0))
    poses = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
    focals = jnp.asarray([[8.0]])
    image = jnp.zeros((1, 8, 8, 3))
    for mode in (EvaluationMode.TRAINING, EvaluationMode.EVALUATION):
        preds = pipeline.forward(
            params, jax.random.PRNGKey(1), poses=poses, focal_lengths=focals,
            image_rgb=image, evaluation_mode=mode,
        )
        assert np.all(np.isfinite(np.asarray(preds["objective"])))


@pytest.mark.slow
def test_mip_nerf_under_proposal_renderer():
    """MipNeRFMLP as the final model of the proposal-estimator family (the
    flagship renderer): the interval machinery must compose with the
    importance-sampled, per-pass-varying point counts."""
    from yanerf_tpu.ops.structures import EvaluationMode
    from yanerf_tpu.pipelines import PIPELINES

    cfg = dict(
        type="NeRFPipeline",
        chunk_size_grid=64,
        num_passes=2,
        output_rasterized_mc=False,
        loss_weights={"loss_rgb_mse": 1.0, "loss_proposal": 1.0},
        model=[
            dict(type="ProposalMLP", n_layers=2, hidden_dim=16, n_harmonic_functions_xyz=2),
            dict(
                type="MipNeRFMLP", base_radius=6e-4, n_layers=2, input_skips=[1],
                n_harmonic_functions_xyz=3, n_harmonic_functions_dir=2,
                n_hidden_neurons_xyz=16, n_hidden_neurons_dir=8, latent_dim=0, color_dim=3,
            ),
        ],
        ray_sampler=dict(
            type="RaySampler", image_height=4, image_width=4, min_depth=1.0, max_depth=3.0,
            n_pts_per_ray_training=8, n_pts_per_ray_evaluation=8,
            n_rays_per_image_sampled_from_mask=16,
        ),
        renderer=dict(
            type="ProposalEmissionAbsorpsionRenderer",
            n_pts_per_ray_final_training=4, n_pts_per_ray_final_evaluation=4,
            n_pts_per_ray_intermediate_training=[], n_pts_per_ray_intermediate_evaluation=[],
            bg_color=[0.0, 0.0, 0.0], density_noise_std_train=0.0,
            background_density_bias=1.0e-6,
        ),
        feature_extractor=[],
    )
    pipeline = PIPELINES.build(cfg)
    params = pipeline.init(jax.random.PRNGKey(0))
    poses = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
    focals = jnp.asarray([[4.0]])
    image = jnp.zeros((1, 4, 4, 3))

    def loss(p):
        preds = pipeline.forward(
            p, jax.random.PRNGKey(1), poses=poses, focal_lengths=focals,
            image_rgb=image, evaluation_mode=EvaluationMode.TRAINING,
        )
        return jnp.mean(preds["objective"])

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_intervals_from_boundaries_match_compositing_deltas():
    """boundary mode: sample i's interval is exactly [t_i, t_{i+1}] — the
    span the EA raymarcher composites density i over — and the last sample
    gets a bounded tail extended by the previous gap."""
    from yanerf_tpu.ops.mip import intervals_from_boundaries

    t = jnp.asarray([[1.0, 1.5, 2.5, 4.0]])
    t0, t1 = intervals_from_boundaries(t)
    np.testing.assert_allclose(np.asarray(t0), [[1.0, 1.5, 2.5, 4.0]])
    np.testing.assert_allclose(np.asarray(t1), [[1.5, 2.5, 4.0, 5.5]])
    # interval widths for interior samples == the raymarcher's deltas
    np.testing.assert_allclose(np.asarray(t1 - t0)[:, :-1], np.asarray(t[:, 1:] - t[:, :-1]))
    # duplicate depths must not produce t1 < t0
    td = jnp.asarray([[1.0, 1.0, 2.0]])
    t0d, t1d = intervals_from_boundaries(td)
    assert bool(jnp.all(t1d >= t0d))


def test_mip_nerf_interval_mode_boundary():
    kwargs = dict(
        n_layers=2, input_skips=[1], n_harmonic_functions_xyz=4,
        n_harmonic_functions_dir=2, n_hidden_neurons_xyz=16, n_hidden_neurons_dir=8,
        latent_dim=0, color_dim=3,
    )
    mid = MipNeRFMLP(base_radius=6e-4, **kwargs)
    bnd = MipNeRFMLP(base_radius=6e-4, interval_mode="boundary", **kwargs)
    params = mid.init(jax.random.PRNGKey(0))
    o, d, t = _bundle(jax.random.PRNGKey(2))
    out_m = mid.apply(params, o, d, t)
    out_b = bnd.apply(params, o, d, t)
    assert out_b["rays_densities"].shape == out_m["rays_densities"].shape
    assert np.all(np.isfinite(np.asarray(out_b["rays_densities"])))
    # different interval parameterization -> different encodings
    assert float(jnp.abs(out_b["rays_densities"] - out_m["rays_densities"]).max()) > 1e-6
    with pytest.raises(ValueError, match="interval_mode"):
        MipNeRFMLP(base_radius=6e-4, interval_mode="nope", **kwargs)


def test_intervals_from_midpoints_never_cross_cone_apex():
    """A near plane smaller than half the first sample gap must not
    extrapolate the first interval edge to t0 < 0 (the frustum moment
    formulas assume 0 < t0 < t1)."""
    from yanerf_tpu.ops.mip import intervals_from_midpoints

    lengths = jnp.linspace(0.04, 6.0, 65)[None]  # gap ~0.093 > 2*near
    t0, t1 = intervals_from_midpoints(lengths)
    assert float(t0.min()) > 0.0
    assert bool(jnp.all(t1 > t0))
