"""Two-pass renderer tests with a real NeRFMLP (mirrors reference tests/test_renderer.py)."""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yanerf_tpu.models import MODELS
from yanerf_tpu.ops.structures import EvaluationMode
from yanerf_tpu.pipelines import RENDERERS, refine_ray_points
from yanerf_tpu.utils import Config

CFG_DIR = osp.join(osp.dirname(__file__), "configs")


def _setup(n_passes=2):
    model_cfg = Config.fromfile(osp.join(CFG_DIR, "models/nerf_mlp.yml")).model
    renderer_cfg = Config.fromfile(osp.join(CFG_DIR, "renderers/renderer.yml")).renderer
    renderer = RENDERERS.build(renderer_cfg)
    models = [MODELS.build(model_cfg) for _ in range(n_passes)]
    params = [m.init(jax.random.PRNGKey(i)) for i, m in enumerate(models)]
    fns = [
        (lambda m, p: lambda o, d, l, **kw: m.apply(p, o, d, l, **kw))(m, p)
        for m, p in zip(models, params)
    ]
    return renderer, fns


def _bundle(rng, batch=2, n_rays=6, n_pts=5):
    k1, k2, k3 = jax.random.split(rng, 3)
    origins = jax.random.normal(k1, (batch, n_rays, 1, 3))
    directions = jax.random.normal(k2, (batch, n_rays, 1, 3))
    lengths = jnp.broadcast_to(jnp.linspace(1.0, 3.0, n_pts), (batch, n_rays, 1, n_pts))
    xys = jnp.zeros((batch, n_rays, 1, 2))
    return origins, directions, lengths, xys


@pytest.mark.parametrize("mode", [EvaluationMode.TRAINING, EvaluationMode.EVALUATION])
def test_two_pass_renderer_shapes(mode):
    renderer, fns = _setup(2)
    origins, directions, lengths, xys = _bundle(jax.random.PRNGKey(0))
    out = renderer(
        jax.random.PRNGKey(1), origins, directions, lengths, xys, None,
        implicit_functions=fns, evaluation_mode=mode,
    )
    B, R = origins.shape[:2]
    assert out.features.shape == (B, R, 1, 3)
    assert out.depths.shape == (B, R, 1, 1)
    assert out.alpha_masks.shape == (B, R, 1, 1)
    # fine pass: coarse 5 + fine 6 appended = 11 samples
    assert out.aux["weights"].shape == (B, R, 1, 11)
    # recursive prev_stage carries the coarse render
    assert out.prev_stage is not None
    assert out.prev_stage.features.shape == (B, R, 1, 3)
    assert out.prev_stage.aux["weights"].shape == (B, R, 1, 5)
    assert out.prev_stage.prev_stage is None


def test_single_pass_renderer():
    renderer, fns = _setup(1)
    origins, directions, lengths, xys = _bundle(jax.random.PRNGKey(0))
    out = renderer(
        jax.random.PRNGKey(1), origins, directions, lengths, xys, None,
        implicit_functions=fns, evaluation_mode=EvaluationMode.EVALUATION,
    )
    assert out.prev_stage is None
    w = np.asarray(out.aux["weights"])
    assert (w.sum(-1) <= 1 + 1e-5).all()


def test_eval_mode_is_deterministic_train_is_not():
    renderer, fns = _setup(2)
    origins, directions, lengths, xys = _bundle(jax.random.PRNGKey(0))
    kwargs = dict(implicit_functions=fns)
    e1 = renderer(jax.random.PRNGKey(1), origins, directions, lengths, xys, None,
                  evaluation_mode=EvaluationMode.EVALUATION, **kwargs)
    e2 = renderer(jax.random.PRNGKey(2), origins, directions, lengths, xys, None,
                  evaluation_mode=EvaluationMode.EVALUATION, **kwargs)
    assert np.allclose(np.asarray(e1.features), np.asarray(e2.features), atol=1e-6)
    t1 = renderer(jax.random.PRNGKey(1), origins, directions, lengths, xys, None,
                  evaluation_mode=EvaluationMode.TRAINING, **kwargs)
    t2 = renderer(jax.random.PRNGKey(2), origins, directions, lengths, xys, None,
                  evaluation_mode=EvaluationMode.TRAINING, **kwargs)
    assert not np.allclose(np.asarray(t1.features), np.asarray(t2.features), atol=1e-6)


def test_refine_ray_points_sorted_and_in_range():
    rng = jax.random.PRNGKey(0)
    origins = jnp.zeros((1, 4, 1, 3))
    directions = jnp.ones((1, 4, 1, 3))
    lengths = jnp.broadcast_to(jnp.linspace(1.0, 3.0, 8), (1, 4, 1, 8))
    xys = jnp.zeros((1, 4, 1, 2))
    weights = jax.random.uniform(rng, (1, 4, 1, 8))
    bundle = refine_ray_points(
        rng, origins, directions, lengths, xys, weights,
        n_pts_per_ray=16, random_sampling=True, add_input_samples=True,
    )
    z = np.asarray(bundle.lengths)
    assert z.shape == (1, 4, 1, 24)
    assert (np.diff(z, axis=-1) >= -1e-6).all()
    assert z.min() >= 1.0 - 1e-5 and z.max() <= 3.0 + 1e-5


def test_eval_compositing_dtype_bf16_close_and_train_exact():
    """eval_compositing_dtype casts only the EVAL compositing inputs: eval
    outputs stay f32-typed and within bf16 tolerance of the f32 path;
    TRAINING is bit-exact (the experiment must not touch the recipe)."""
    model_cfg = Config.fromfile(osp.join(CFG_DIR, "models/nerf_mlp.yml")).model
    renderer_cfg = Config.fromfile(osp.join(CFG_DIR, "renderers/renderer.yml")).renderer
    base = RENDERERS.build(renderer_cfg)
    renderer_cfg.eval_compositing_dtype = "bfloat16"
    bf16 = RENDERERS.build(renderer_cfg)
    model = MODELS.build(model_cfg)
    params = model.init(jax.random.PRNGKey(0))
    fns = [lambda o, d, l, **kw: model.apply(params, o, d, l, **kw)] * 2
    origins, directions, lengths, xys = _bundle(jax.random.PRNGKey(0))

    for mode, rng in ((EvaluationMode.EVALUATION, None), (EvaluationMode.TRAINING, jax.random.PRNGKey(1))):
        out0 = base(rng, origins, directions, lengths, xys, None,
                    implicit_functions=fns, evaluation_mode=mode)
        out1 = bf16(rng, origins, directions, lengths, xys, None,
                    implicit_functions=fns, evaluation_mode=mode)
        assert out1.features.dtype == jnp.float32
        f0, f1 = np.asarray(out0.features), np.asarray(out1.features)
        if mode == EvaluationMode.TRAINING:
            np.testing.assert_array_equal(f0, f1)
        else:
            np.testing.assert_allclose(f0, f1, atol=3e-2)
            assert not np.array_equal(f0, f1)  # the cast actually happened


def test_eval_compositing_dtype_proposal_renderer():
    model_cfg = Config.fromfile(osp.join(CFG_DIR, "models/nerf_mlp.yml")).model
    model = MODELS.build(model_cfg)
    params = model.init(jax.random.PRNGKey(0))
    fns = [lambda o, d, l, **kw: model.apply(params, o, d, l, **kw)] * 2
    cfg = dict(type="ProposalEmissionAbsorpsionRenderer",
               n_pts_per_ray_final_evaluation=4, n_pts_per_ray_final_training=4)
    base = RENDERERS.build(dict(cfg))
    bf16 = RENDERERS.build(dict(cfg, eval_compositing_dtype="bfloat16"))
    origins, directions, lengths, xys = _bundle(jax.random.PRNGKey(0))
    out0 = base(None, origins, directions, lengths, xys, None,
                implicit_functions=fns, evaluation_mode=EvaluationMode.EVALUATION)
    out1 = bf16(None, origins, directions, lengths, xys, None,
                implicit_functions=fns, evaluation_mode=EvaluationMode.EVALUATION)
    assert out1.features.dtype == jnp.float32
    assert out1.aux["weights"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out0.features), np.asarray(out1.features), atol=5e-2)
