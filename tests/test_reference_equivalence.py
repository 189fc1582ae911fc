"""Live numerical equivalence against the reference implementation.

The environment has no network egress (DNS resolution fails), so the
released lego/fern checkpoints and the NeRF datasets cannot be fetched.
This test is the strongest available substitute for the PSNR-parity run:
it executes the ACTUAL reference package (torch, CPU) side by side with
this framework on identical weights — exported through the reference's own
``.pth`` checkpoint layout and pulled in by ``import_torch_checkpoint`` —
and asserts the forward activations and the full eval-mode render match in
float32. If the released checkpoints were loadable, eval PSNR would match
by composition: importer + forward are both certified here.

Skipped when /root/reference or torch is unavailable. The reference code is
only *executed*, never copied.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE_DIR = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_DIR, "yanerf")),
    reason="reference implementation not available",
)

torch = pytest.importorskip("torch")


def _install_reference(monkeypatch):
    """Make the reference package importable: stub its addict/yapf deps."""

    class _Dict(dict):
        def __init__(self, *args, **kwargs):
            super().__init__()
            for arg in args:
                if arg:
                    for k, v in (arg.items() if isinstance(arg, dict) else arg):
                        self[k] = self._hook(v)
            for k, v in kwargs.items():
                self[k] = self._hook(v)

        @classmethod
        def _hook(cls, v):
            if isinstance(v, dict):
                return cls(v)
            if isinstance(v, (list, tuple)):
                return type(v)(cls._hook(x) for x in v)
            return v

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = self._hook(v)

    if "addict" not in sys.modules:
        addict = types.ModuleType("addict")
        addict.Dict = _Dict
        monkeypatch.setitem(sys.modules, "addict", addict)
    if "yapf" not in sys.modules:
        yapf = types.ModuleType("yapf")
        yapflib = types.ModuleType("yapf.yapflib")
        yapf_api = types.ModuleType("yapf.yapflib.yapf_api")
        yapf_api.FormatCode = lambda code, **kw: (code, True)
        monkeypatch.setitem(sys.modules, "yapf", yapf)
        monkeypatch.setitem(sys.modules, "yapf.yapflib", yapflib)
        monkeypatch.setitem(sys.modules, "yapf.yapflib.yapf_api", yapf_api)
    if REFERENCE_DIR not in sys.path:
        monkeypatch.syspath_prepend(REFERENCE_DIR)


# NOTE: n_hidden_neurons_xyz must be 256 here — the reference hard-codes the
# xyz-encoder hidden width to 256 regardless of the config knob (its
# _construct_xyz_encoder omits hidden_dim, ref nerf_mlp.py:87-94 + :226); we
# deliberately honor the knob instead (docs/parity.md). Every published
# reference config uses 256, where the two coincide.
MODEL_CFG = dict(
    n_layers=4,
    input_skips=[2],
    n_harmonic_functions_xyz=10,
    n_harmonic_functions_dir=4,
    n_hidden_neurons_xyz=256,
    n_hidden_neurons_dir=32,
    latent_dim=0,
    color_dim=3,
)


def _export_pth(ref_module, tmp_path, prefix=""):
    sd = {f"{prefix}{k}": v for k, v in ref_module.state_dict().items()}
    pth = tmp_path / "ref.pth"
    torch.save({"model": sd, "optimizer": {}, "epoch": -1}, pth)
    return pth


def test_nerf_mlp_forward_matches_reference(monkeypatch, tmp_path):
    _install_reference(monkeypatch)
    from yanerf.pipelines.models.nerf_mlp import NeRFMLP as RefNeRFMLP

    import jax

    from yanerf_tpu.models import MODELS
    from yanerf_tpu.runners import import_torch_checkpoint

    torch.manual_seed(0)
    ref_model = RefNeRFMLP(**MODEL_CFG).eval()

    ours = MODELS.build(dict(type="NeRFMLP", compute_dtype="float32", **MODEL_CFG))
    params = {"implicit_functions": [ours.init(jax.random.PRNGKey(0))], "feature_extractors": []}
    pth = _export_pth(ref_model, tmp_path, prefix="implicit_functions.0._fn.")
    params, n_missing = import_torch_checkpoint(pth, params)
    assert n_missing == 0

    rng = np.random.RandomState(1)
    origins = rng.uniform(-1, 1, size=(2, 6, 5, 3)).astype(np.float32)
    directions = rng.uniform(-1, 1, size=(2, 6, 5, 3)).astype(np.float32)
    lengths = np.sort(rng.uniform(0.5, 4.0, size=(2, 6, 5, 7)).astype(np.float32), axis=-1)

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(origins), torch.from_numpy(directions), torch.from_numpy(lengths)
        )
    our_out = ours.apply(params["implicit_functions"][0], origins, directions, lengths)

    for key in ("rays_densities", "rays_features"):
        ref_v = ref_out[key].numpy()
        our_v = np.asarray(our_out[key])
        assert our_v.shape == ref_v.shape
        np.testing.assert_allclose(our_v, ref_v, atol=2e-5, rtol=1e-4, err_msg=key)


def test_pipeline_eval_forward_matches_reference(monkeypatch, tmp_path):
    """Full two-pass EVALUATION forward: ray sampling, both MLP passes,
    raymarcher, deterministic sample_pdf refinement, chunked rendering,
    metrics — same weights, compared end to end."""
    _install_reference(monkeypatch)
    import jax

    H = W = 12
    pipeline_cfg = dict(
        chunk_size_grid=512,  # forces several eval chunks on both sides
        num_passes=2,
        output_rasterized_mc=False,
        loss_weights={"loss_rgb_mse": 1.0, "loss_prev_stage_rgb_mse": 1.0},
        model=dict(type="NeRFMLP", **MODEL_CFG),
        ray_sampler=dict(
            type="RaySampler",
            image_height=H,
            image_width=W,
            min_depth=1.0,
            max_depth=4.0,
            n_pts_per_ray_training=8,
            n_pts_per_ray_evaluation=8,
            n_rays_per_image_sampled_from_mask=16,
            stratified_point_sampling_training=False,
            stratified_point_sampling_evaluation=False,
        ),
        renderer=dict(
            type="MultipassEmissionAbsorpsionRenderer",
            append_coarse_samples_to_fine=True,
            bg_color=[0.2, 0.3, 0.4],
            density_noise_std_train=0.0,
            n_pts_per_ray_fine_training=16,
            n_pts_per_ray_fine_evaluation=16,
            background_density_bias=1e-6,
        ),
        feature_extractor=[],
    )

    # --- reference side -----------------------------------------------------
    from yanerf.pipelines import PIPELINES as REF_PIPELINES
    from yanerf.pipelines.utils import EvaluationMode as RefEvaluationMode

    AttrDict = sys.modules["addict"].Dict
    ref_cfg = AttrDict({"type": "NeRFPipeline", **_to_ref_cfg(pipeline_cfg)})
    torch.manual_seed(0)
    ref_pipeline = REF_PIPELINES.build(ref_cfg).eval()

    rng = np.random.RandomState(2)
    poses = np.broadcast_to(np.eye(4, dtype=np.float32), (2, 4, 4)).copy()
    poses[:, 2, 3] = 2.5
    poses[1, 0, 3] = 0.3
    focals = np.full((2, 1), float(W), dtype=np.float32)
    image = rng.rand(2, H, W, 3).astype(np.float32)

    with torch.no_grad():
        ref_preds = ref_pipeline(
            poses=torch.from_numpy(poses),
            focal_lengths=torch.from_numpy(focals),
            image_rgb=torch.from_numpy(image),
            evaluation_mode=RefEvaluationMode.EVALUATION,
        )

    # --- our side, reference weights ----------------------------------------
    from yanerf_tpu.ops.structures import EvaluationMode
    from yanerf_tpu.pipelines import PIPELINES
    from yanerf_tpu.runners import import_torch_checkpoint

    ours = PIPELINES.build(dict(type="NeRFPipeline", **_to_our_cfg(pipeline_cfg)))
    params = ours.init(jax.random.PRNGKey(0))
    pth = _export_pth(ref_pipeline, tmp_path)
    params, n_missing = import_torch_checkpoint(pth, params)
    assert n_missing == 0

    preds = ours.forward(
        params,
        jax.random.PRNGKey(0),
        poses=poses,
        focal_lengths=focals,
        image_rgb=image,
        evaluation_mode=EvaluationMode.EVALUATION,
    )

    pairs = [
        ("rendered_images", 3e-4),
        ("rendered_depths", 2e-2),  # depth = sum(w*z): inherits cumsum f32 ordering noise
        ("loss_rgb_mse", 3e-4),
        ("loss_prev_stage_rgb_mse", 3e-4),
        ("objective", 5e-4),
    ]
    for key, atol in pairs:
        ref_v = ref_preds[key].detach().numpy()
        our_v = np.asarray(preds[key], dtype=np.float32)
        assert our_v.shape == ref_v.shape, (key, our_v.shape, ref_v.shape)
        np.testing.assert_allclose(our_v, ref_v, atol=atol, rtol=1e-3, err_msg=key)


def _to_ref_cfg(cfg):
    out = dict(cfg)
    out["model"] = dict(type="NeRFMLP", **MODEL_CFG)
    return out


def _to_our_cfg(cfg):
    out = dict(cfg)
    out["model"] = dict(type="NeRFMLP", compute_dtype="float32", **MODEL_CFG)
    return out
