"""Full pipeline integration tests (mirrors reference tests/test_pipeline.py).

The ZeroOutputer variant enables exact numeric assertions: zero density means
pure background everywhere, so the rendered image equals the bg image and the
objective is exactly zero when GT == bg.
"""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from yanerf_tpu.ops.structures import EvaluationMode
from yanerf_tpu.pipelines import PIPELINES
from yanerf_tpu.utils import Config

CFG_DIR = osp.join(osp.dirname(__file__), "configs")
IMG_PATH = osp.join(osp.dirname(__file__), "data", "image.png")


def _load_pipeline(name):
    cfg = Config.fromfile(osp.join(CFG_DIR, "pipelines", name))
    pipeline = PIPELINES.build(cfg.pipeline)
    params = pipeline.init(jax.random.PRNGKey(0))
    return pipeline, params


def _camera_batch(batch=2):
    rng = jax.random.PRNGKey(5)
    poses = jnp.broadcast_to(jnp.eye(4), (batch, 4, 4))
    # push cameras back along -z so the scene is in front
    poses = poses.at[:, 2, 3].set(-2.0)
    focals = jnp.full((batch, 1), 8.0)
    image = jnp.asarray(np.array(Image.open(IMG_PATH).convert("RGB"), dtype=np.float32) / 255.0)
    image = jnp.broadcast_to(image, (batch, *image.shape))
    return poses, focals, image, rng


def test_pipeline_zero_outputer_training_mode():
    pipeline, params = _load_pipeline("nerf_pipeline_cfg_with_zero_outputer.py")
    poses, focals, image, rng = _camera_batch()

    preds = pipeline.forward(
        params, rng,
        poses=poses, focal_lengths=focals,
        bg_image_rgb=image, image_rgb=image,
        evaluation_mode=EvaluationMode.TRAINING,
    )
    # Zero density -> render == bg == GT at every sampled ray -> zero loss.
    assert preds["objective"].shape == (2,)
    assert np.allclose(np.asarray(preds["objective"]), 0.0, atol=1e-6)
    assert np.allclose(np.asarray(preds["loss_rgb_mse"]), 0.0, atol=1e-7)
    # rasterized MC renders exist with full image shape
    assert preds["rendered_images"].shape == (2, 6, 10, 3)


def test_pipeline_zero_outputer_eval_mode_renders_bg():
    pipeline, params = _load_pipeline("nerf_pipeline_cfg_with_zero_outputer.py")
    poses, focals, image, rng = _camera_batch()
    preds = pipeline.forward(
        params, rng,
        poses=poses, focal_lengths=focals,
        bg_image_rgb=image, image_rgb=image,
        evaluation_mode=EvaluationMode.EVALUATION,
    )
    assert preds["rendered_images"].shape == (2, 6, 10, 3)
    assert np.allclose(np.asarray(preds["rendered_images"]), np.asarray(image), atol=1e-5)
    assert np.allclose(np.asarray(preds["objective"]), 0.0, atol=1e-6)
    assert preds["rendered_depths"].shape == (2, 6, 10, 1)
    assert preds["rendered_alpha_masks"].shape == (2, 6, 10, 1)


@pytest.mark.parametrize("cfg_name", ["nerf_pipeline_cfg_with_mlp.py", "nerf_pipeline_cfg_with_conditional_mlp.py"])
@pytest.mark.parametrize("mode", [EvaluationMode.TRAINING, EvaluationMode.EVALUATION])
def test_pipeline_nerf_mlp_modes(cfg_name, mode):
    pipeline, params = _load_pipeline(cfg_name)
    poses, focals, image, rng = _camera_batch()
    kwargs = {}
    if "conditional" in cfg_name:
        kwargs["global_codes"] = jax.random.normal(jax.random.PRNGKey(9), (2, 6))

    preds = pipeline.forward(
        params, rng,
        poses=poses, focal_lengths=focals,
        bg_image_rgb=image, image_rgb=image,
        evaluation_mode=mode,
        **kwargs,
    )
    assert preds["objective"].shape == (2,)
    assert "loss_rgb_mse" in preds and "loss_prev_stage_rgb_mse" in preds
    if mode == EvaluationMode.EVALUATION:
        assert preds["rendered_images"].shape == (2, 6, 10, 3)
    else:
        # 4 rays per image, rasterized back to the full grid
        assert preds["rendered_images"].shape == (2, 6, 10, 3)
    assert np.isfinite(np.asarray(preds["objective"])).all()


def test_pipeline_custom_image_size():
    pipeline, params = _load_pipeline("nerf_pipeline_cfg_with_zero_outputer.py")
    poses, focals, _, rng = _camera_batch()
    H, W = 4, 8
    image = jax.random.uniform(jax.random.PRNGKey(0), (2, H, W, 3))
    preds = pipeline.forward(
        params, rng,
        poses=poses, focal_lengths=focals,
        image_height=H, image_width=W,
        bg_image_rgb=image, image_rgb=image,
        evaluation_mode=EvaluationMode.EVALUATION,
    )
    assert preds["rendered_images"].shape == (2, H, W, 3)
    assert np.allclose(np.asarray(preds["rendered_images"]), np.asarray(image), atol=1e-5)


def test_pipeline_eval_without_gt_has_no_objective():
    pipeline, params = _load_pipeline("nerf_pipeline_cfg_with_zero_outputer.py")
    poses, focals, image, rng = _camera_batch()
    preds = pipeline.forward(
        params, rng,
        poses=poses, focal_lengths=focals,
        bg_image_rgb=image,
        evaluation_mode=EvaluationMode.EVALUATION,
    )
    assert "objective" not in preds
    assert preds["rendered_images"].shape == (2, 6, 10, 3)


@pytest.mark.slow
def test_pipeline_forward_is_jittable():
    pipeline, params = _load_pipeline("nerf_pipeline_cfg_with_mlp.py")
    poses, focals, image, rng = _camera_batch()

    @jax.jit
    def fwd(params, rng, poses, focals, image):
        return pipeline.forward(
            params, rng, poses=poses, focal_lengths=focals,
            bg_image_rgb=image, image_rgb=image,
            evaluation_mode=EvaluationMode.TRAINING,
        )

    preds = fwd(params, rng, poses, focals, image)
    assert np.isfinite(np.asarray(preds["objective"])).all()

    grads = jax.jit(
        jax.grad(
            lambda p: jnp.mean(
                pipeline.forward(
                    p, rng, poses=poses, focal_lengths=focals,
                    bg_image_rgb=image, image_rgb=image,
                    evaluation_mode=EvaluationMode.TRAINING,
                )["objective"]
            )
        )
    )(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # gradients actually flow into the first MLP layer
    g0 = np.asarray(grads["implicit_functions"][0]["xyz_encoder"]["mlp"][0]["w"])
    assert np.abs(g0).max() > 0


def test_pipeline_per_pass_model_list():
    """`model` may be a list of per-pass configs; num_passes follows it."""
    cfg = Config.fromfile(osp.join(CFG_DIR, "pipelines", "nerf_pipeline_cfg_with_mlp.py"))
    small = dict(cfg.pipeline.model)
    big = dict(cfg.pipeline.model)
    big["n_hidden_neurons_xyz"] = 96
    cfg.pipeline.model = [small, big]
    cfg.pipeline.num_passes = 1  # rewritten to 2 from the list length
    pipeline = PIPELINES.build(cfg.pipeline)
    assert pipeline.num_passes == 2
    assert pipeline.implicit_functions[0].n_hidden_neurons_xyz == 64
    assert pipeline.implicit_functions[1].n_hidden_neurons_xyz == 96

    params = pipeline.init(jax.random.PRNGKey(0))
    poses, focals, image, rng = _camera_batch()
    preds = pipeline.forward(
        params, rng, poses=poses, focal_lengths=focals,
        bg_image_rgb=image, image_rgb=image, evaluation_mode=EvaluationMode.TRAINING,
    )
    assert "loss_prev_stage_rgb_mse" in preds and np.isfinite(np.asarray(preds["objective"])).all()


def test_pipeline_unchunked_eval_matches_chunked():
    pipeline, params = _load_pipeline("nerf_pipeline_cfg_with_mlp.py")
    poses, focals, image, rng = _camera_batch()
    kwargs = dict(poses=poses, focal_lengths=focals, bg_image_rgb=image, image_rgb=image,
                  evaluation_mode=EvaluationMode.EVALUATION)
    chunked = pipeline.forward(params, rng, **kwargs)
    pipeline.chunk_size_grid = 0  # direct (unchunked) renderer call
    direct = pipeline.forward(params, rng, **kwargs)
    np.testing.assert_allclose(
        np.asarray(chunked["rendered_images"]), np.asarray(direct["rendered_images"]), rtol=2e-4, atol=2e-5
    )


def test_pipeline_per_image_depth_bounds():
    """LLFF-style traced min/max depth arrays flow through ray sampling."""
    pipeline, params = _load_pipeline("nerf_pipeline_cfg_with_zero_outputer.py")
    poses, focals, image, rng = _camera_batch()
    min_d = jnp.asarray([[1.5], [1.5]])
    max_d = jnp.asarray([[4.5], [4.5]])
    preds = pipeline.forward(
        params, rng,
        poses=poses, focal_lengths=focals,
        min_depth=min_d, max_depth=max_d,
        bg_image_rgb=image, image_rgb=image,
        evaluation_mode=EvaluationMode.EVALUATION,
    )
    assert np.allclose(np.asarray(preds["objective"]), 0.0, atol=1e-6)

    # and under jit with traced bounds
    @jax.jit
    def fwd(p, lo, hi):
        return pipeline.forward(
            p, rng, poses=poses, focal_lengths=focals, min_depth=lo, max_depth=hi,
            bg_image_rgb=image, image_rgb=image, evaluation_mode=EvaluationMode.EVALUATION,
        )["rendered_depths"]

    d1 = fwd(params, min_d, max_d)
    d2 = fwd(params, min_d + 1.0, max_d + 1.0)
    assert np.isfinite(np.asarray(d1)).all() and np.isfinite(np.asarray(d2)).all()


def test_pipeline_honors_sampler_sampling_modes_and_defaults():
    """The pipeline must branch on the modes the SAMPLER was configured
    with (they act jointly), and build when the config relies on the
    sampler's default image size."""
    from yanerf_tpu.ops.structures import RenderSamplingMode
    from yanerf_tpu.pipelines import PIPELINES

    p = PIPELINES.build(dict(
        type="NeRFPipeline", chunk_size_grid=0, num_passes=1,
        model=dict(type="ZeroOutputer"),
        ray_sampler=dict(type="RaySampler", sampling_mode_evaluation="mask_sample",
                         n_rays_per_image_sampled_from_mask=8),
        renderer=dict(type="MultipassEmissionAbsorpsionRenderer"),
        feature_extractor=[],
    ))
    assert p.render_image_height == 400 and p.render_image_width == 400
    assert p.sampling_mode_evaluation == RenderSamplingMode.MASK_SAMPLE
    assert p.sampling_mode_training == RenderSamplingMode.MASK_SAMPLE
