"""Pallas kernel equivalence tests (interpreter mode on the CPU mesh)."""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yanerf_tpu.models import MODELS
from yanerf_tpu.ops.pallas import nerf_mlp_forward_pallas
from yanerf_tpu.utils import Config

CFG_DIR = osp.join(osp.dirname(__file__), "configs")


def _model_and_inputs(n_rays=3, n_pts=5, compute_dtype="float32"):
    cfg = Config.fromfile(osp.join(CFG_DIR, "models/nerf_mlp.yml"))
    cfg.model.compute_dtype = compute_dtype
    model = MODELS.build(cfg.model)
    params = model.init(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(rng, 3)
    origins = jax.random.normal(k1, (1, n_rays, 1, 3))
    directions = jax.random.normal(k2, (1, n_rays, 1, 3))
    lengths = jnp.sort(jax.random.uniform(k3, (1, n_rays, 1, n_pts)) * 3 + 1, axis=-1)
    return model, params, origins, directions, lengths


def test_pallas_kernel_matches_jnp_forward():
    model, params, origins, directions, lengths = _model_and_inputs()
    ref = model.apply(params, origins, directions, lengths, use_pallas=False)

    from yanerf_tpu.ops.rays import ray_bundle_to_ray_points

    points = ray_bundle_to_ray_points(origins, directions, lengths)
    dens, cols = nerf_mlp_forward_pallas(model, params, points, directions, tile=8, interpret=True)

    np.testing.assert_allclose(np.asarray(dens), np.asarray(ref["rays_densities"]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cols), np.asarray(ref["rays_features"]), rtol=1e-5, atol=1e-5)


def test_pallas_kernel_handles_padding():
    # 3 rays x 5 pts = 15 points with tile 8 -> one padded tile
    model, params, origins, directions, lengths = _model_and_inputs(n_rays=3, n_pts=5)
    ref = model.apply(params, origins, directions, lengths, use_pallas=False)
    from yanerf_tpu.ops.rays import ray_bundle_to_ray_points

    points = ray_bundle_to_ray_points(origins, directions, lengths)
    dens, cols = nerf_mlp_forward_pallas(model, params, points, directions, tile=8, interpret=True)
    assert dens.shape == ref["rays_densities"].shape
    np.testing.assert_allclose(np.asarray(cols), np.asarray(ref["rays_features"]), rtol=1e-5, atol=1e-5)


def test_model_apply_use_pallas_flag_routes_to_kernel():
    model, params, origins, directions, lengths = _model_and_inputs()
    out_ref = model.apply(params, origins, directions, lengths, use_pallas=False)
    out_pal = model.apply(params, origins, directions, lengths, use_pallas=True)
    np.testing.assert_allclose(
        np.asarray(out_pal["rays_features"]), np.asarray(out_ref["rays_features"]), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_pipeline_training_forces_jnp_path_under_grad():
    """use_pallas=True pipelines must still train (grad falls back to jnp)."""
    from yanerf_tpu.ops.structures import EvaluationMode
    from yanerf_tpu.pipelines import PIPELINES

    cfg = Config.fromfile(osp.join(CFG_DIR, "pipelines", "nerf_pipeline_cfg_with_mlp.py"))
    cfg.pipeline.model.use_pallas = True
    pipeline = PIPELINES.build(cfg.pipeline)
    params = pipeline.init(jax.random.PRNGKey(0))

    poses = jnp.broadcast_to(jnp.eye(4), (1, 4, 4)).at[:, 2, 3].set(-2.0)
    focals = jnp.full((1, 1), 8.0)
    image = jax.random.uniform(jax.random.PRNGKey(2), (1, 6, 10, 3))

    def loss(p):
        preds = pipeline.forward(
            p, jax.random.PRNGKey(1), poses=poses, focal_lengths=focals,
            bg_image_rgb=image, image_rgb=image, evaluation_mode=EvaluationMode.TRAINING,
        )
        return jnp.mean(preds["objective"])

    grads = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads))


def test_fused_backward_matches_jnp_grads():
    """Custom-VJP Pallas backward must reproduce XLA weight gradients."""
    from yanerf_tpu.ops.pallas import make_fused_mlp
    from yanerf_tpu.ops.rays import ray_bundle_to_ray_points

    model, params, origins, directions, lengths = _model_and_inputs(n_rays=4, n_pts=6)
    points = ray_bundle_to_ray_points(origins, directions, lengths)
    key = jax.random.PRNGKey(7)
    td = jax.random.normal(key, (1, 4, 1, 6, 1))
    tc = jax.random.normal(jax.random.fold_in(key, 1), (1, 4, 1, 6, 3))

    def loss_jnp(p):
        out = model.apply(p, origins, directions, lengths, use_pallas=False)
        return jnp.sum(out["rays_densities"] * td) + jnp.sum(out["rays_features"] * tc)

    fused = make_fused_mlp(model)

    def loss_fused(p):
        dens, cols = fused(p, points, directions)
        return jnp.sum(dens * td) + jnp.sum(cols * tc)

    g_ref = jax.grad(loss_jnp)(params)
    g_pal = jax.grad(loss_fused)(params)

    flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_pal = jax.tree_util.tree_leaves(g_pal)
    assert len(flat_ref) == len(flat_pal)
    for (path, a), b in zip(flat_ref, flat_pal):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5,
            err_msg=f"gradient mismatch at {path}",
        )


def test_fused_backward_padding_does_not_leak():
    """Padded (zero-cotangent) tail points must not contribute gradients."""
    from yanerf_tpu.ops.pallas import nerf_mlp_backward_pallas
    from yanerf_tpu.ops.rays import ray_bundle_to_ray_points

    model, params, origins, directions, lengths = _model_and_inputs(n_rays=3, n_pts=5)  # 15 pts
    points = ray_bundle_to_ray_points(origins, directions, lengths)
    key = jax.random.PRNGKey(3)
    gd = jax.random.normal(key, (1, 3, 1, 5, 1))
    gc = jax.random.normal(jax.random.fold_in(key, 2), (1, 3, 1, 5, 3))

    g8 = nerf_mlp_backward_pallas(model, params, points, directions, gd, gc, tile=8, interpret=True)
    g16 = nerf_mlp_backward_pallas(model, params, points, directions, gd, gc, tile=16, interpret=True)
    for a, b in zip(jax.tree_util.tree_leaves(g8), jax.tree_util.tree_leaves(g16)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_pallas_pipelined_kernel_bitwise_matches_plain():
    """The software-pipelined variant (VPU embedding of tile i overlapped
    against the MXU chain of tile i-1, double-buffered scratch) must be a
    pure scheduling change: outputs bit-identical to the plain fused kernel
    at every tile boundary case (exact multiple, padding, single tile)."""
    import numpy as np

    from yanerf_tpu.ops.pallas.nerf_mlp_kernel import nerf_mlp_forward_pallas as fwd

    cfg = Config.fromfile(osp.join(CFG_DIR, "models/nerf_mlp.yml"))
    model = MODELS.build(cfg.model)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    for n_rays, n_pts, tile in ((16, 16, 64), (10, 7, 32), (2, 3, 128)):
        pts = jnp.asarray(rng.randn(1, n_rays, n_pts, 3).astype(np.float32))
        dirs = jnp.asarray(rng.randn(1, n_rays, 3).astype(np.float32))
        d0, c0 = fwd(model, params, pts, dirs, tile=tile, interpret=True)
        d1, c1 = fwd(model, params, pts, dirs, tile=tile, interpret=True, pipelined=True)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c0))
