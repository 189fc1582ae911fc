"""Torch .pth importer test: build a reference-layout state_dict with torch,
import it, and verify the jnp forward reproduces the torch-side linear algebra
on the first layer (weight transpose + bias)."""

import os.path as osp

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from yanerf_tpu.models import MODELS
from yanerf_tpu.runners import import_torch_checkpoint
from yanerf_tpu.utils import Config

CFG_DIR = osp.join(osp.dirname(__file__), "configs")


def _reference_layout_state_dict(model):
    """Emulate the reference NeRFPipeline state_dict naming for one pass."""
    sd = {}
    g = torch.Generator().manual_seed(0)

    def rand(*shape):
        return torch.rand(*shape, generator=g) - 0.5

    prefix = "implicit_functions.0._fn."
    for li, layer in enumerate(model.init(jax.random.PRNGKey(0))["xyz_encoder"]["mlp"]):
        in_dim, out_dim = layer["w"].shape
        sd[f"{prefix}xyz_encoder.mlp.{li}.0.weight"] = rand(out_dim, in_dim)
        sd[f"{prefix}xyz_encoder.mlp.{li}.0.bias"] = rand(out_dim)
    h = model.n_hidden_neurons_xyz
    sd[f"{prefix}intermediate_linear.weight"] = rand(h, h)
    sd[f"{prefix}intermediate_linear.bias"] = rand(h)
    sd[f"{prefix}density_layer.weight"] = rand(1, h)
    sd[f"{prefix}density_layer.bias"] = rand(1)
    # color Sequential: 0 = LinearWithRepeat, 1 = ReLU, 2 = Linear, 3 = Sigmoid
    c_in = h + model.embedding_dim_dir
    sd[f"{prefix}color_layer.0.weight"] = rand(model.n_hidden_neurons_dir, c_in)
    sd[f"{prefix}color_layer.0.bias"] = rand(model.n_hidden_neurons_dir)
    sd[f"{prefix}color_layer.2.weight"] = rand(model.color_dim, model.n_hidden_neurons_dir)
    sd[f"{prefix}color_layer.2.bias"] = rand(model.color_dim)
    return sd


def test_import_torch_checkpoint_roundtrip(tmp_path):
    cfg = Config.fromfile(osp.join(CFG_DIR, "models/nerf_mlp.yml"))
    model = MODELS.build(cfg.model)
    params = {"implicit_functions": [model.init(jax.random.PRNGKey(0))], "feature_extractors": []}

    sd = _reference_layout_state_dict(model)
    pth = tmp_path / "ckpts_-001.pth"
    torch.save({"model": sd, "optimizer": {}, "epoch": -1}, pth)

    imported, n_missing = import_torch_checkpoint(pth, params)
    assert n_missing == 0, f"{n_missing} reference tensors failed to map"

    # weights transpose to (in, out); bias passthrough
    w0_torch = sd["implicit_functions.0._fn.xyz_encoder.mlp.0.0.weight"].numpy()
    w0_ours = np.asarray(imported["implicit_functions"][0]["xyz_encoder"]["mlp"][0]["w"])
    assert np.allclose(w0_ours, w0_torch.T)

    # forward consistency on the first layer: torch F.linear == ours
    x = np.random.RandomState(0).rand(4, w0_torch.shape[1]).astype(np.float32)
    torch_out = torch.nn.functional.linear(
        torch.from_numpy(x),
        sd["implicit_functions.0._fn.xyz_encoder.mlp.0.0.weight"],
        sd["implicit_functions.0._fn.xyz_encoder.mlp.0.0.bias"],
    ).numpy()
    from yanerf_tpu.models.layers import linear

    ours = np.asarray(linear(jax.tree_util.tree_map(np.asarray, imported["implicit_functions"][0]["xyz_encoder"]["mlp"][0]), x))
    assert np.allclose(ours, torch_out, atol=1e-5)

    # LinearWithRepeat weight maps onto the fused color weight
    c0 = np.asarray(imported["implicit_functions"][0]["color_layer"][0]["w"])
    assert np.allclose(c0, sd["implicit_functions.0._fn.color_layer.0.weight"].numpy().T)
    c_last = np.asarray(imported["implicit_functions"][0]["color_layer"][-1]["w"])
    assert np.allclose(c_last, sd["implicit_functions.0._fn.color_layer.2.weight"].numpy().T)
