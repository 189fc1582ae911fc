"""Model shape-contract tests (mirrors reference tests/test_models.py scope)."""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yanerf_tpu.models import MODELS
from yanerf_tpu.utils import Config

CFG_DIR = osp.join(osp.dirname(__file__), "configs")
CFG_PATHS = ["models/nerf_mlp.yml", "models/conditional_nerf_mlp.yml"]


def _rand_bundle(rng, batch, spatial, n_pts):
    k1, k2, k3 = jax.random.split(rng, 3)
    origins = jax.random.normal(k1, (batch, *spatial, 3))
    directions = jax.random.normal(k2, (batch, *spatial, 3))
    lengths = jnp.sort(jax.random.uniform(k3, (batch, *spatial, n_pts)) * 3 + 1, axis=-1)
    return origins, directions, lengths


@pytest.mark.parametrize("cfg_path", CFG_PATHS)
@pytest.mark.parametrize("spatial", [(7, 1), (4, 5)])
def test_nerf_mlp_shapes(cfg_path, spatial):
    cfg = Config.fromfile(osp.join(CFG_DIR, cfg_path))
    model = MODELS.build(cfg.model)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng)

    batch, n_pts = 2, 5
    origins, directions, lengths = _rand_bundle(rng, batch, spatial, n_pts)
    global_codes = (
        jax.random.normal(rng, (batch, model.latent_dim)) if model.latent_dim > 0 else None
    )
    out = model.apply(params, origins, directions, lengths, global_codes=global_codes)
    assert out["rays_densities"].shape == (batch, *spatial, n_pts, 1)
    assert out["rays_features"].shape == (batch, *spatial, n_pts, model.color_dim)
    # colors come out of a sigmoid
    feats = np.asarray(out["rays_features"])
    assert (feats >= 0).all() and (feats <= 1).all()


def test_nerf_mlp_latent_dim_validation():
    cfg = Config.fromfile(osp.join(CFG_DIR, "models/conditional_nerf_mlp.yml"))
    model = MODELS.build(cfg.model)
    params = model.init(jax.random.PRNGKey(0))
    origins, directions, lengths = _rand_bundle(jax.random.PRNGKey(1), 2, (3, 1), 5)
    with pytest.raises(ValueError):
        model.apply(params, origins, directions, lengths, global_codes=None)
    with pytest.raises(ValueError):
        bad_codes = jnp.zeros((2, model.latent_dim + 1))
        model.apply(params, origins, directions, lengths, global_codes=bad_codes)


def test_nerf_mlp_param_shapes_match_architecture():
    cfg = Config.fromfile(osp.join(CFG_DIR, "models/nerf_mlp.yml"))
    model = MODELS.build(cfg.model)
    params = model.init(jax.random.PRNGKey(0))

    embed_xyz = 3 * (2 * 4 + 1)  # 4 freqs, append input
    embed_dir = 3 * (2 * 2 + 1)
    mlp = params["xyz_encoder"]["mlp"]
    assert mlp[0]["w"].shape == (embed_xyz, 64)
    assert mlp[3]["w"].shape == (64 + embed_xyz, 64)  # skip layer re-widens input
    assert params["density_layer"]["w"].shape == (64, 1)
    assert np.allclose(np.asarray(params["density_layer"]["b"]), 0.0)  # zero-init bias
    assert params["color_layer"][0]["w"].shape == (64 + embed_dir, 32)
    assert params["color_layer"][-1]["w"].shape == (32, 3)


def test_nerf_mlp_deterministic_given_params():
    cfg = Config.fromfile(osp.join(CFG_DIR, "models/nerf_mlp.yml"))
    model = MODELS.build(cfg.model)
    params = model.init(jax.random.PRNGKey(0))
    origins, directions, lengths = _rand_bundle(jax.random.PRNGKey(1), 1, (3, 1), 5)
    out1 = model.apply(params, origins, directions, lengths)
    out2 = jax.jit(lambda p, o, d, l: model.apply(p, o, d, l))(params, origins, directions, lengths)
    assert np.allclose(np.asarray(out1["rays_densities"]), np.asarray(out2["rays_densities"]), atol=1e-5)


def test_zero_outputer():
    model = MODELS.build({"type": "ZeroOutputer"})
    params = model.init(jax.random.PRNGKey(0))
    origins, directions, lengths = _rand_bundle(jax.random.PRNGKey(1), 2, (4, 1), 5)
    out = model.apply(params, origins, directions, lengths)
    assert np.allclose(np.asarray(out["rays_densities"]), 0.0)
    assert out["rays_features"].shape == (2, 4, 1, 5, 3)


def test_mlp_with_input_skips_affine_and_no_last_relu():
    from yanerf_tpu.models.mlp import MLPWithInputSkips

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (7, 10))

    # concat-skip variant widens the skip layer input
    mlp = MLPWithInputSkips(n_layers=4, input_dim=10, output_dim=6, skip_dim=10, hidden_dim=12, input_skips=[2])
    params = mlp.init(rng)
    assert params["mlp"][2]["w"].shape == (12 + 10, 12)
    out = mlp.apply(params, x)
    assert out.shape == (7, 6)
    assert np.asarray(out).min() >= 0  # final ReLU

    # affine-skip variant keeps layer widths and adds affine params
    mlp_aff = MLPWithInputSkips(
        n_layers=4, input_dim=10, output_dim=6, skip_dim=10, hidden_dim=12,
        input_skips=[2], skip_affine_trans=True,
    )
    p_aff = mlp_aff.init(rng)
    assert p_aff["mlp"][2]["w"].shape == (12, 12)
    assert p_aff["skip_affines"][0]["l1"]["w"].shape == (10, 24)
    out_aff = mlp_aff.apply(p_aff, x)
    assert out_aff.shape == (7, 6) and np.isfinite(np.asarray(out_aff)).all()

    # no_last_relu leaves the final layer linear (negatives possible)
    mlp_lin = MLPWithInputSkips(n_layers=2, input_dim=10, output_dim=6, hidden_dim=12, input_skips=[], no_last_relu=True)
    out_lin = mlp_lin.apply(mlp_lin.init(rng), x)
    assert np.asarray(out_lin).min() < 0


def test_nerf_paper_v1_extra_color_layers():
    cfg = Config.fromfile(osp.join(CFG_DIR, "models/nerf_mlp.yml"))
    cfg.model.nerf_paper_v1 = True
    cfg.model.n_layers = 8  # -> 2 extra color layers
    model = MODELS.build(cfg.model)
    assert model.n_extra_color_layers == 2
    params = model.init(jax.random.PRNGKey(0))
    assert len(params["color_layer"]) == 4  # first + 2 extra + last
    origins, directions, lengths = _rand_bundle(jax.random.PRNGKey(1), 1, (3, 1), 4)
    out = model.apply(params, origins, directions, lengths)
    assert out["rays_features"].shape == (1, 3, 1, 4, 3)
