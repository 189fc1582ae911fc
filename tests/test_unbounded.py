"""Unbounded-scene support: mip-NeRF 360 contraction + disparity sampling
(ops/rays.py::contract_points, xy_to_ray_bundle(sample_in_disparity=True),
model-level contract_coords)."""

import jax
import jax.numpy as jnp
import numpy as np

from yanerf_tpu.ops import rays as ops_rays
from yanerf_tpu.ops.structures import EvaluationMode
from yanerf_tpu.pipelines import PIPELINES


def test_contract_points_properties():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(500, 3) * 10.0)
    y = np.asarray(ops_rays.contract_points(x))
    norms_in = np.linalg.norm(np.asarray(x), axis=-1)
    norms_out = np.linalg.norm(y, axis=-1)
    # identity inside the unit ball
    inside = norms_in <= 1.0
    np.testing.assert_allclose(y[inside], np.asarray(x)[inside])
    # everything lands strictly inside radius 2
    assert norms_out.max() < 2.0
    # direction preserved, radius monotone in input radius
    dirs_in = np.asarray(x) / np.maximum(norms_in[:, None], 1e-9)
    dirs_out = y / np.maximum(norms_out[:, None], 1e-9)
    np.testing.assert_allclose(dirs_in[~inside], dirs_out[~inside], atol=1e-5)
    order = np.argsort(norms_in)
    assert (np.diff(norms_out[order]) > -1e-6).all()
    # gradients finite everywhere incl. the |x|=1 boundary and the origin
    g = jax.grad(lambda p: jnp.sum(ops_rays.contract_points(p)))(
        jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 0.0], [5.0, -3.0, 2.0]])
    )
    assert np.isfinite(np.asarray(g)).all()


def test_sample_in_disparity_spacing():
    poses = jnp.eye(4)[None, :3, :4]
    focal = jnp.asarray([[8.0]])
    grid = jnp.broadcast_to(ops_rays.get_xy_grid(4, 4), (1, 4, 4, 2))
    near, far, n = 0.5, 50.0, 16
    bundle = ops_rays.xy_to_ray_bundle(
        poses, 4, 4, focal, grid, near, far, n, sample_in_disparity=True
    )
    z = np.asarray(bundle.lengths)[0, 0, 0]
    np.testing.assert_allclose(z[0], near, rtol=1e-5)
    np.testing.assert_allclose(z[-1], far, rtol=1e-4)
    # uniform in 1/z
    disp = 1.0 / z
    np.testing.assert_allclose(np.diff(disp), np.diff(disp)[0], rtol=1e-4)
    # monotone increasing depths
    assert (np.diff(z) > 0).all()


def test_unbounded_pipeline_trains_finite():
    """contract_coords + sample_in_disparity across a proposal pipeline with
    a huge far bound: objective finite, gradients flow."""
    cfg = dict(
        type="NeRFPipeline",
        chunk_size_grid=64,
        num_passes=2,
        output_rasterized_mc=False,
        loss_weights={"loss_rgb_mse": 1.0, "loss_proposal": 1.0},
        model=[
            dict(type="ProposalMLP", n_layers=2, hidden_dim=16, n_harmonic_functions_xyz=2,
                 contract_coords=True),
            dict(type="NeRFMLP", n_layers=2, input_skips=[1], n_harmonic_functions_xyz=2,
                 n_harmonic_functions_dir=1, n_hidden_neurons_xyz=16, n_hidden_neurons_dir=8,
                 latent_dim=0, color_dim=3, contract_coords=True),
        ],
        ray_sampler=dict(
            type="RaySampler",
            image_height=4,
            image_width=4,
            min_depth=0.5,
            max_depth=200.0,
            sample_in_disparity=True,
            n_pts_per_ray_training=8,
            n_pts_per_ray_evaluation=8,
            n_rays_per_image_sampled_from_mask=16,
        ),
        renderer=dict(
            type="ProposalEmissionAbsorpsionRenderer",
            n_pts_per_ray_final_training=4,
            n_pts_per_ray_final_evaluation=4,
            bg_color=[0.0, 0.0, 0.0],
            background_density_bias=1.0e-6,
        ),
        feature_extractor=[],
    )
    pipeline = PIPELINES.build(cfg)
    params = pipeline.init(jax.random.PRNGKey(0))
    poses = jnp.eye(4)[None].at[0, 2, 3].set(2.0)
    focals = jnp.asarray([[4.0]])
    image = jax.random.uniform(jax.random.PRNGKey(1), (1, 4, 4, 3))

    def objective(params):
        preds = pipeline.forward(
            params, jax.random.PRNGKey(2), poses=poses, focal_lengths=focals,
            image_rgb=image, evaluation_mode=EvaluationMode.TRAINING,
        )
        return jnp.mean(preds["objective"])

    val, grads = jax.value_and_grad(objective)(params)
    assert np.isfinite(float(val))
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0.0
