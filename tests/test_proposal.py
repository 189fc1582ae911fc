"""Proposal-sampler family tests: interlevel loss math, renderer contract,
pipeline integration, and tiny-overfit convergence (the same de-facto
correctness bar as tests/test_runner.py)."""

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yanerf_tpu.datasets.loader import DataLoader, create_sampler
from yanerf_tpu.ops.proposal import interlevel_loss
from yanerf_tpu.ops.structures import EvaluationMode
from yanerf_tpu.pipelines import PIPELINES, RENDERERS
from yanerf_tpu.runners import (
    RunType,
    create_lr_schedule,
    create_optimizer,
    create_train_state,
    make_train_step,
    train_one_epoch,
)
from yanerf_tpu.utils import ConfigDict


# -- interlevel loss ----------------------------------------------------------


def test_interlevel_loss_zero_for_identical_histograms():
    t = jnp.asarray([[0.0, 1.0, 2.0, 3.0, 4.0]])
    w = jnp.asarray([[0.1, 0.4, 0.2, 0.1, 0.0]])
    loss = interlevel_loss(t, w, t, w)
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-7)


def test_interlevel_loss_zero_when_proposal_dominates():
    # proposal puts MORE mass everywhere than the final -> no excess
    t = jnp.asarray([[0.0, 1.0, 2.0, 3.0]])
    w_final = jnp.asarray([[0.1, 0.2, 0.1, 0.0]])
    w_prop = jnp.asarray([[0.3, 0.5, 0.4, 0.0]])
    loss = interlevel_loss(t, w_final, t, w_prop)
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-7)


def test_interlevel_loss_hand_computed():
    # final: one interval [1, 2] with weight 0.5
    t_f = jnp.asarray([[1.0, 2.0]])
    w_f = jnp.asarray([[0.5, 0.0]])  # second weight = sentinel interval, dropped
    # proposal: intervals [0,1] w 0.3 and [3,4] w 0.3 -> zero overlap mass
    # except endpoint touching: [0,1] touches t=1 inclusively -> counted.
    t_p = jnp.asarray([[0.0, 1.0, 3.0, 4.0]])
    w_p = jnp.asarray([[0.3, 0.0, 0.3, 0.0]])
    # w_outer for final interval [1,2]: prop bins overlapping (inclusive):
    #   [0,1] (t_hat_hi == t_lo) -> 0.3 ; [1,3] -> weight 0.0 ; [3,4] no.
    # excess = relu(0.5 - 0.3) = 0.2 ; loss = 0.2^2 / (0.5 + eps)
    loss = float(interlevel_loss(t_f, w_f, t_p, w_p)[0])
    np.testing.assert_allclose(loss, 0.2**2 / 0.5, rtol=1e-5)


def test_interlevel_loss_gradients_only_to_proposal_weights():
    t_f = jnp.asarray([[1.0, 1.5, 2.0]])
    w_f = jnp.asarray([[0.5, 0.3, 0.0]])
    t_p = jnp.asarray([[0.5, 1.2, 2.5]])
    w_p = jnp.asarray([[0.05, 0.05, 0.0]])

    g_wp = jax.grad(lambda w: interlevel_loss(t_f, w_f, t_p, w).sum())(w_p)
    assert float(jnp.abs(g_wp).sum()) > 0.0  # proposal learns

    g_wf = jax.grad(lambda w: interlevel_loss(t_f, w, t_p, w_p).sum())(w_f)
    np.testing.assert_allclose(np.asarray(g_wf), 0.0)  # final is ground truth

    g_tf = jax.grad(lambda t: interlevel_loss(t, w_f, t_p, w_p).sum())(t_f)
    np.testing.assert_allclose(np.asarray(g_tf), 0.0)  # geometry detached


# -- renderer contract --------------------------------------------------------


def _proposal_pipeline_cfg(hw=4, n_prop_pts=8, n_final=4, n_props=1):
    models = [
        dict(type="ProposalMLP", n_layers=2, hidden_dim=16, n_harmonic_functions_xyz=2)
        for _ in range(n_props)
    ]
    models.append(
        dict(
            type="NeRFMLP",
            n_layers=2,
            input_skips=[1],
            n_harmonic_functions_dir=2,
            n_harmonic_functions_xyz=2,
            n_hidden_neurons_dir=8,
            n_hidden_neurons_xyz=16,
            latent_dim=0,
            color_dim=3,
        )
    )
    return dict(
        type="NeRFPipeline",
        chunk_size_grid=64,
        num_passes=n_props + 1,
        output_rasterized_mc=False,
        loss_weights={"loss_rgb_mse": 1.0, "loss_proposal": 1.0},
        model=models,
        ray_sampler=dict(
            type="RaySampler",
            image_height=hw,
            image_width=hw,
            min_depth=1.0,
            max_depth=3.0,
            n_pts_per_ray_training=n_prop_pts,
            n_pts_per_ray_evaluation=n_prop_pts,
            n_rays_per_image_sampled_from_mask=hw * hw,
        ),
        renderer=dict(
            type="ProposalEmissionAbsorpsionRenderer",
            n_pts_per_ray_final_training=n_final,
            n_pts_per_ray_final_evaluation=n_final,
            n_pts_per_ray_intermediate_training=[6] * (n_props - 1),
            n_pts_per_ray_intermediate_evaluation=[6] * (n_props - 1),
            bg_color=[0.0, 0.0, 0.0],
            density_noise_std_train=0.0,
            # guards the dead-ReLU density collapse, as every production
            # config does (lego.yml); without it the tiny overfit run can
            # deterministically stall at the all-background local optimum
            background_density_bias=1.0e-6,
        ),
        feature_extractor=[],
    )


@pytest.mark.parametrize("n_props", [1, 2])
def test_proposal_pipeline_forward_both_modes(n_props):
    pipeline = PIPELINES.build(_proposal_pipeline_cfg(n_props=n_props))
    params = pipeline.init(jax.random.PRNGKey(0))
    poses = jnp.eye(4)[None].at[0, 2, 3].set(2.0)
    focals = jnp.asarray([[4.0]])
    image = jax.random.uniform(jax.random.PRNGKey(1), (1, 4, 4, 3))

    for mode in (EvaluationMode.TRAINING, EvaluationMode.EVALUATION):
        preds = pipeline.forward(
            params,
            jax.random.PRNGKey(2),
            poses=poses,
            focal_lengths=focals,
            image_rgb=image,
            evaluation_mode=mode,
        )
        assert "loss_proposal" in preds
        assert preds["loss_proposal"].shape == (1,)
        assert np.isfinite(float(jnp.mean(preds["objective"])))
        if mode == EvaluationMode.EVALUATION:
            assert preds["rendered_images"].shape == (1, 4, 4, 3)


def test_proposal_renderer_rejects_wrong_intermediate_count():
    renderer = RENDERERS.build(
        dict(
            type="ProposalEmissionAbsorpsionRenderer",
            n_pts_per_ray_final_training=4,
            n_pts_per_ray_final_evaluation=4,
        )
    )
    fns = [lambda *a, **k: None] * 3  # 2 proposals + main but no intermediate counts
    with pytest.raises(ValueError, match="intermediate"):
        renderer(
            None,
            jnp.zeros((1, 1, 1, 3)),
            jnp.ones((1, 1, 1, 3)),
            jnp.linspace(1.0, 2.0, 4)[None, None, None],
            jnp.zeros((1, 1, 1, 2)),
            None,
            implicit_functions=fns,
            evaluation_mode=EvaluationMode.TRAINING,
        )


def test_proposal_gradients_reach_proposal_model():
    """The proposal model trains ONLY via the interlevel loss — check it
    actually receives nonzero gradients through the pipeline objective."""
    pipeline = PIPELINES.build(_proposal_pipeline_cfg())
    params = pipeline.init(jax.random.PRNGKey(0))
    poses = jnp.eye(4)[None].at[0, 2, 3].set(2.0)
    focals = jnp.asarray([[4.0]])
    image = jax.random.uniform(jax.random.PRNGKey(1), (1, 4, 4, 3))

    def objective(params):
        preds = pipeline.forward(
            params,
            jax.random.PRNGKey(2),
            poses=poses,
            focal_lengths=focals,
            image_rgb=image,
            evaluation_mode=EvaluationMode.TRAINING,
        )
        return jnp.mean(preds["objective"])

    grads = jax.grad(objective)(params)
    prop_grads = grads["implicit_functions"][0]
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(prop_grads))
    assert total > 0.0
    main_grads = grads["implicit_functions"][1]
    total_main = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(main_grads))
    assert total_main > 0.0


# -- convergence --------------------------------------------------------------


class DummyDatasetWrapper(NamedTuple):
    poses: np.ndarray
    focal_lengths: np.ndarray
    image_rgb: np.ndarray


class DummyDataset:
    data_wrapper: Callable = DummyDatasetWrapper

    def __init__(self, n_items=8, hw=2):
        rng = np.random.RandomState(0)
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = -2.0
        self.pose = pose
        self.focal = np.asarray([2.0], dtype=np.float32)
        self.image = rng.rand(hw, hw, 3).astype(np.float32)
        self.n_items = n_items

    def __getitem__(self, idx):
        return self.pose, self.focal, self.image

    def __len__(self):
        return self.n_items


def test_proposal_train_converges(tmp_path):
    hw = 2
    cfg_p = _proposal_pipeline_cfg(hw=hw, n_prop_pts=8, n_final=6)
    cfg_p["ray_sampler"]["min_depth"] = 1.0
    cfg_p["ray_sampler"]["max_depth"] = 3.0
    pipeline = PIPELINES.build(cfg_p)
    dataset = DummyDataset(hw=hw)
    loader = DataLoader(
        dataset, create_sampler(dataset, shuffle=True), batch_size=1, is_train=True, num_workers=0
    )

    runner_cfg = ConfigDict(
        dict(
            init_lr=5e-3,
            min_lr=5e-4,
            weight_decay=0.0,
            warmup_steps=0,
            warmup_lr=1e-5,
            lr_decay_type="exponential",
            lr_decay_rate=0.1,
            lr_decay_iters=10000,
            num_iters=100,
            print_per_iter=1000,
            val_per_iter=10_000_000,
            output_dir=str(tmp_path),
            hooks=[],
        )
    )
    optimizer = create_optimizer(runner_cfg)
    state = create_train_state(pipeline.init(jax.random.PRNGKey(0)), optimizer)
    train_step = make_train_step(pipeline, optimizer)
    rng = jax.random.PRNGKey(42)

    stats = {}
    for epoch in range(8):
        state, stats = train_one_epoch(
            RunType.TRAIN,
            runner_cfg,
            epoch,
            state,
            loader,
            train_step,
            rng,
            lr_schedule=create_lr_schedule(runner_cfg),
        )
    # the photometric part must overfit the constant 2x2 image
    assert stats["loss_rgb_mse"] < 0.01, stats


# -- stratified inverse-CDF sampling ------------------------------------------


def test_sample_pdf_stratified_is_sorted_and_matches_distribution():
    from yanerf_tpu.ops.sample_pdf import sample_pdf

    bins = jnp.broadcast_to(jnp.linspace(0.0, 4.0, 9), (512, 9))
    weights = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0, 3.0, 0.0, 0.0, 2.0, 0.0]), (512, 8))
    s = sample_pdf(bins, weights, 32, rng=jax.random.PRNGKey(0), det=False, stratified=True)
    # sorted by construction
    assert bool(jnp.all(s[..., 1:] >= s[..., :-1]))
    # mass concentrates where the pdf does: bins [1.0,2.0) w 4/6, [3.0,3.5) w 2/6
    frac_mid = float(jnp.mean((s >= 1.0) & (s < 2.0)))
    frac_hi = float(jnp.mean((s >= 3.0) & (s < 3.5)))
    np.testing.assert_allclose(frac_mid, 4 / 6, atol=0.03)
    np.testing.assert_allclose(frac_hi, 2 / 6, atol=0.03)


def test_refine_sortfree_paths_produce_sorted_lengths():
    from yanerf_tpu.pipelines.renderer import refine_ray_points

    origins = jnp.zeros((2, 64, 3))
    directions = jnp.ones((2, 64, 3))
    lengths = jnp.broadcast_to(jnp.linspace(1.0, 3.0, 16), (2, 64, 16))
    xys = jnp.zeros((2, 64, 2))
    w = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 16))

    for random_sampling in (True, False):
        b = refine_ray_points(
            jax.random.PRNGKey(1), origins, directions, lengths, xys, w,
            n_pts_per_ray=24, random_sampling=random_sampling,
            add_input_samples=False, stratified_u=True,
        )
        assert bool(jnp.all(b.lengths[..., 1:] >= b.lengths[..., :-1]))
        assert b.lengths.shape == (2, 64, 24)


# -- distortion loss -----------------------------------------------------------


def test_distortion_loss_prefers_concentrated_weights():
    from yanerf_tpu.ops.proposal import distortion_loss

    t = jnp.broadcast_to(jnp.linspace(1.0, 3.0, 17), (1, 17))
    concentrated = jnp.zeros((1, 17)).at[0, 8].set(1.0)
    spread = jnp.full((1, 17), 1.0 / 16).at[0, -1].set(0.0)
    l_conc = float(distortion_loss(t, concentrated)[0])
    l_spread = float(distortion_loss(t, spread)[0])
    assert l_conc < l_spread
    # zero weights -> zero loss
    np.testing.assert_allclose(float(distortion_loss(t, jnp.zeros((1, 17)))[0]), 0.0)
    # scale invariance: stretching the ray span leaves the loss unchanged
    l_scaled = float(distortion_loss(t * 100.0, spread)[0])
    np.testing.assert_allclose(l_scaled, l_spread, rtol=1e-5)


def test_distortion_loss_disparity_spacing():
    """With in_disparity, disparity-spaced samples see UNIFORM s-space bins.

    Samples uniform in disparity over [1, 100] are wildly non-uniform in
    metric t (far bins span tens of units); measured through g(t) = 1/t
    they are uniform, so the loss must equal the metric-mode loss on a
    uniform grid with the same weights (mip-NeRF 360 eq. 15's s-space).
    """
    from yanerf_tpu.ops.proposal import distortion_loss

    n = 17
    near, far = 1.0, 100.0
    s = jnp.linspace(0.0, 1.0, n)
    t_disp = 1.0 / (s * (1.0 / far - 1.0 / near) + 1.0 / near)  # disparity-spaced
    t_uniform = jnp.linspace(0.0, 1.0, n)
    w = jax.random.dirichlet(jax.random.PRNGKey(0), jnp.ones(n))[None]

    l_disp = float(distortion_loss(t_disp[None], w, in_disparity=True)[0])
    l_uniform_metric = float(distortion_loss(t_uniform[None], w)[0])
    np.testing.assert_allclose(l_disp, l_uniform_metric, rtol=1e-4)

    # without the flag, the far-dominated metric measure inflates the loss
    l_disp_wrong = float(distortion_loss(t_disp[None], w)[0])
    assert l_disp_wrong != pytest.approx(l_disp, rel=1e-2)


def test_distortion_loss_flows_through_pipeline():
    cfg = _proposal_pipeline_cfg()
    cfg["loss_weights"]["loss_distortion"] = 0.01
    pipeline = PIPELINES.build(cfg)
    params = pipeline.init(jax.random.PRNGKey(0))
    poses = jnp.eye(4)[None].at[0, 2, 3].set(2.0)
    focals = jnp.asarray([[4.0]])
    image = jax.random.uniform(jax.random.PRNGKey(1), (1, 4, 4, 3))
    preds = pipeline.forward(
        params, jax.random.PRNGKey(2), poses=poses, focal_lengths=focals,
        image_rgb=image, evaluation_mode=EvaluationMode.TRAINING,
    )
    assert "loss_distortion" in preds and preds["loss_distortion"].shape == (1,)
    assert np.isfinite(float(jnp.mean(preds["objective"])))

    grads = jax.grad(lambda p: jnp.mean(pipeline.forward(
        p, jax.random.PRNGKey(2), poses=poses, focal_lengths=focals,
        image_rgb=image, evaluation_mode=EvaluationMode.TRAINING)["objective"]))(params)
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0.0


def test_distortion_loss_fixed_near_far_rewards_concentration():
    """With the published fixed g(near)/g(far) normalization, a ray whose
    (resampled) mass concentrates in a small physical region must score
    LOWER than one spread across the frustum — the property the
    sampled-span fallback erases (it re-stretches every ray to [0, 1])."""
    from yanerf_tpu.ops.proposal import distortion_loss

    near = jnp.full((2, 1), 2.0)
    far = jnp.full((2, 1), 6.0)
    # ray 0: tight cluster of samples; ray 1: spread over the full chord
    tight = jnp.linspace(3.0, 3.2, 17)
    spread = jnp.linspace(2.0, 6.0, 17)
    lengths = jnp.stack([tight, spread])
    w = jnp.ones((2, 17)) / 16.0
    loss = np.asarray(distortion_loss(lengths, w, near=near, far=far))
    assert loss[0] < loss[1] * 0.2, loss
    # without near/far both rays re-normalize to [0,1] and tie (the flaw)
    loss_fallback = np.asarray(distortion_loss(lengths, w))
    np.testing.assert_allclose(loss_fallback[0], loss_fallback[1], rtol=1e-5)


def test_distortion_loss_near_far_matches_fallback_at_sampler_spacing():
    """When lengths span exactly [near, far] (sampler-spaced depths), the
    explicit normalization equals the first/last-sample fallback."""
    from yanerf_tpu.ops.proposal import distortion_loss

    lengths = jnp.linspace(2.0, 6.0, 33)[None]
    w = jax.nn.softmax(jnp.sin(jnp.arange(33.0)))[None]
    a = distortion_loss(lengths, w)
    # fallback uses interval edges: first t_lo = lengths[0], last t_hi =
    # lengths[-1] (intervals are [l_k, l_{k+1}]) — pass exactly those
    b = distortion_loss(lengths, w, near=lengths[..., :1], far=lengths[..., -1:])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
