"""Multipass (coarse -> fine) emission-absorption renderer.

Behavioural reference: ``MultipassEmissionAbsorpsionRenderer`` +
``RayPointRefiner`` at
/root/reference/yanerf/pipelines/renderers/multipass_emission_absorpsion_renderer.py:12-117
and renderers/utils.py:36-69.

The pass recursion is unrolled at trace time (the number of passes is static),
so a 2-pass NeRF compiles to a single XLA program: coarse MLP -> compositing
-> inverse-CDF refinement -> fine MLP -> compositing, with no host round-trips.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from yanerf_tpu.ops.proposal import distortion_loss, interlevel_loss
from yanerf_tpu.ops.raymarch import emission_absorption, emission_absorption_weights
from yanerf_tpu.ops.sample_pdf import sample_pdf
from yanerf_tpu.ops.structures import EvaluationMode, RayBundle, RendererOutput

from .builder import RENDERERS


def refine_ray_points(
    rng: Optional[jax.Array],
    origins: jax.Array,
    directions: jax.Array,
    lengths: jax.Array,
    xys: jax.Array,
    ray_weights: jax.Array,
    *,
    n_pts_per_ray: int,
    random_sampling: bool,
    add_input_samples: bool = True,
    stratified_u: bool = False,
) -> RayBundle:
    """Importance-sample new depths from previous-pass weights.

    Mid-bin edges + interior weights feed the inverse CDF; new samples are
    detached (the reference runs the refiner under ``no_grad``), optionally
    merged with the coarse depths, and re-sorted. With ``stratified_u``
    (the proposal renderer's mode) random u's are stratified, so when the
    coarse samples aren't merged back the inverse-CDF output is already
    sorted and the explicit ``sort`` is skipped (profiler-visible at
    training scale).
    """
    z_vals = lengths
    z_vals_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_samples = sample_pdf(
        z_vals_mid,
        ray_weights[..., 1:-1],
        n_pts_per_ray,
        rng=rng,
        det=not random_sampling,
        stratified=stratified_u,
    )
    z_samples = jax.lax.stop_gradient(z_samples)

    if add_input_samples:
        z_vals = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
    elif random_sampling and not stratified_u:
        z_vals = jnp.sort(z_samples, axis=-1)
    else:
        z_vals = z_samples  # monotone by construction (det or stratified u)
    return RayBundle(origins=origins, directions=directions, lengths=z_vals, xys=xys)


def _compositing_cast(eval_compositing_dtype, evaluation_mode, model_out):
    """Optionally cast compositing inputs to a cheaper dtype at evaluation.

    An eval-only bandwidth experiment (VERDICT r3 #3 "try bf16 eval
    compositing"): the MLP already computes in bf16 and casts its outputs
    to f32; this re-casts the (rays, pts, .) density/feature tensors
    entering the compositing fusions, halving their HBM traffic. Depth
    samples/directions stay f32 (bf16's 8-bit mantissa would quantize the
    deltas). Outputs are cast back to f32 by the callers so metrics and
    downstream consumers are unchanged in type.
    """
    if eval_compositing_dtype is None or evaluation_mode == EvaluationMode.TRAINING:
        return model_out
    out = dict(model_out)
    out["rays_densities"] = model_out["rays_densities"].astype(eval_compositing_dtype)
    if "rays_features" in out:
        out["rays_features"] = model_out["rays_features"].astype(eval_compositing_dtype)
    return out


@RENDERERS.register_module()
class MultipassEmissionAbsorpsionRenderer:
    def __init__(
        self,
        n_pts_per_ray_fine_training: int = 64,
        n_pts_per_ray_fine_evaluation: int = 64,
        stratified_sampling_coarse_training: bool = True,
        stratified_sampling_coarse_evaluation: bool = False,
        append_coarse_samples_to_fine: bool = True,
        bg_color: Sequence[float] = (0.0,),
        density_noise_std_train: float = 0.0,
        capping_function: str = "exponential",  # exponential | cap1
        weight_function: str = "product",  # product | minimum
        background_opacity: float = 1e10,
        blend_output: bool = False,
        background_density_bias: float = 0.0,
        hard_background: bool = False,
        density_relu: bool = True,
        density_activation: Optional[str] = None,  # relu | softplus | none (supersedes density_relu)
        density_pre_activation_bias: float = 0.0,
        surface_thickness: int = 1,
        eval_compositing_dtype: str = None,
    ) -> None:
        self.density_noise_std_train = density_noise_std_train
        # eval-only compositing dtype experiment (see _compositing_cast)
        self.eval_compositing_dtype = (
            jnp.dtype(eval_compositing_dtype) if eval_compositing_dtype else None
        )
        self.append_coarse_samples_to_fine = append_coarse_samples_to_fine
        self._refiner_cfg = {
            EvaluationMode.TRAINING: (n_pts_per_ray_fine_training, stratified_sampling_coarse_training),
            EvaluationMode.EVALUATION: (n_pts_per_ray_fine_evaluation, stratified_sampling_coarse_evaluation),
        }
        self.raymarcher_kwargs = dict(
            default_bg_color=tuple(bg_color),
            capping_function=capping_function,
            weight_function=weight_function,
            background_opacity=background_opacity,
            density_relu=density_relu,
            density_activation=density_activation,
            density_pre_activation_bias=density_pre_activation_bias,
            blend_output=blend_output,
            background_density_bias=background_density_bias,
            hard_background=hard_background,
            surface_thickness=surface_thickness,
        )

    def __call__(
        self,
        rng: Optional[jax.Array],
        origins: jax.Array,
        directions: jax.Array,
        lengths: jax.Array,
        xys: jax.Array,
        bg_color: Optional[jax.Array],
        *,
        implicit_functions: List[Callable[..., Dict[str, Any]]],
        evaluation_mode: EvaluationMode = EvaluationMode.EVALUATION,
        **kwargs,
    ) -> RendererOutput:
        if not implicit_functions:
            raise ValueError("The multipass renderer expects at least one implicit function")
        return self._run_raymarcher(
            rng, origins, directions, lengths, xys, bg_color, list(implicit_functions), None, evaluation_mode, **kwargs
        )

    def _run_raymarcher(
        self,
        rng: Optional[jax.Array],
        origins: jax.Array,
        directions: jax.Array,
        lengths: jax.Array,
        xys: jax.Array,
        bg_color: Optional[jax.Array],
        implicit_functions: List[Callable[..., Dict[str, Any]]],
        prev_stage: Optional[RendererOutput],
        evaluation_mode: EvaluationMode,
        **kwargs,
    ) -> RendererOutput:
        density_noise_std = self.density_noise_std_train if evaluation_mode == EvaluationMode.TRAINING else 0.0

        noise_rng = refine_rng = next_rng = None
        if rng is not None:
            noise_rng, refine_rng, next_rng = jax.random.split(rng, 3)

        model_out = implicit_functions[0](origins, directions, lengths, **kwargs)
        cast_out = _compositing_cast(self.eval_compositing_dtype, evaluation_mode, model_out)
        features, depths, alpha_masks, weights = emission_absorption(
            cast_out["rays_densities"],
            cast_out["rays_features"],
            ray_lengths=lengths,
            ray_directions=directions,
            density_noise_std=density_noise_std,
            rng=noise_rng,
            bg_color=bg_color,
            **self.raymarcher_kwargs,
        )
        if self.eval_compositing_dtype is not None:
            features, depths, alpha_masks, weights = (
                x.astype(jnp.float32) for x in (features, depths, alpha_masks, weights)
            )
        aux = dict(model_out.get("aux", {}))
        aux["weights"] = weights

        output = RendererOutput(
            features=features, depths=depths, alpha_masks=alpha_masks, aux=aux, prev_stage=prev_stage
        )

        if len(implicit_functions) > 1:
            n_pts_fine, random_sampling = self._refiner_cfg[evaluation_mode]
            ray_bundle = refine_ray_points(
                refine_rng,
                origins,
                directions,
                lengths,
                xys,
                weights,
                n_pts_per_ray=n_pts_fine,
                random_sampling=random_sampling,
                add_input_samples=self.append_coarse_samples_to_fine,
            )
            output = self._run_raymarcher(
                next_rng, *ray_bundle, bg_color, implicit_functions[1:], output, evaluation_mode, **kwargs
            )
        return output


@RENDERERS.register_module()
class ProposalEmissionAbsorpsionRenderer:
    """Proposal-sampler renderer: the TPU-native fast-NeRF estimator.

    Replaces the reference's coarse->fine scheme (full MLP at 64 + 192
    points/ray, multipass_emission_absorpsion_renderer.py:84-117) with
    the proposal estimator of mip-NeRF 360 / NerfAcc (PAPERS.md):
    ``implicit_functions = [proposal_0, ..., proposal_{k-1}, main]``,
    where each proposal is a tiny density-only model whose emission-
    absorption weights importance-sample the next pass's depths
    (without re-appending the previous samples), and only the final,
    expensive model composites colors. The proposals are trained by the
    histogram consistency loss (ops/proposal.py) surfaced per-ray as
    ``aux["loss_proposal"]`` — weight it via the pipeline's
    ``loss_weights``.

    Why this is the TPU-native speed path: the sample budget for the
    expensive model drops ~6x (e.g. 64 proposal pts on a 4x128 MLP + 32
    final pts on the 8x256 MLP ~= 48 MFLOP/ray vs the reference
    schedule's 305), it is matmuls end-to-end (no gathers — cf. the
    hash-grid analysis in docs/performance.md), and the whole multipass
    program still compiles to one XLA program.
    """

    def __init__(
        self,
        n_pts_per_ray_final_training: int = 32,
        n_pts_per_ray_final_evaluation: int = 32,
        n_pts_per_ray_intermediate_training: Sequence[int] = (),
        n_pts_per_ray_intermediate_evaluation: Sequence[int] = (),
        stratified_sampling_training: bool = True,
        stratified_sampling_evaluation: bool = False,
        bg_color: Sequence[float] = (0.0,),
        density_noise_std_train: float = 0.0,
        capping_function: str = "exponential",
        weight_function: str = "product",
        background_opacity: float = 1e10,
        blend_output: bool = False,
        background_density_bias: float = 0.0,
        hard_background: bool = False,
        density_relu: bool = True,
        density_activation: Optional[str] = None,  # relu | softplus | none (supersedes density_relu)
        density_pre_activation_bias: float = 0.0,
        surface_thickness: int = 1,
        interlevel_loss_eps: float = 1e-7,
        distortion_in_disparity: bool = False,
        eval_compositing_dtype: str = None,
    ) -> None:
        self.density_noise_std_train = density_noise_std_train
        # eval-only compositing dtype experiment (see _compositing_cast)
        self.eval_compositing_dtype = (
            jnp.dtype(eval_compositing_dtype) if eval_compositing_dtype else None
        )
        # set alongside the ray sampler's sample_in_disparity so the
        # distortion loss measures spread in the matching s coordinate
        self.distortion_in_disparity = distortion_in_disparity
        self._final_cfg = {
            EvaluationMode.TRAINING: (n_pts_per_ray_final_training, stratified_sampling_training),
            EvaluationMode.EVALUATION: (n_pts_per_ray_final_evaluation, stratified_sampling_evaluation),
        }
        self._intermediate_cfg = {
            EvaluationMode.TRAINING: tuple(n_pts_per_ray_intermediate_training),
            EvaluationMode.EVALUATION: tuple(n_pts_per_ray_intermediate_evaluation),
        }
        self.interlevel_loss_eps = interlevel_loss_eps
        self.weights_kwargs = dict(
            capping_function=capping_function,
            weight_function=weight_function,
            background_opacity=background_opacity,
            density_relu=density_relu,
            density_activation=density_activation,
            density_pre_activation_bias=density_pre_activation_bias,
            background_density_bias=background_density_bias,
            surface_thickness=surface_thickness,
        )
        self.raymarcher_kwargs = dict(
            default_bg_color=tuple(bg_color),
            blend_output=blend_output,
            hard_background=hard_background,
            **self.weights_kwargs,
        )

    def __call__(
        self,
        rng: Optional[jax.Array],
        origins: jax.Array,
        directions: jax.Array,
        lengths: jax.Array,
        xys: jax.Array,
        bg_color: Optional[jax.Array],
        *,
        implicit_functions: List[Callable[..., Dict[str, Any]]],
        evaluation_mode: EvaluationMode = EvaluationMode.EVALUATION,
        **kwargs,
    ) -> RendererOutput:
        if len(implicit_functions) < 2:
            raise ValueError(
                "The proposal renderer expects [proposal..., main] — at least two implicit functions"
            )
        n_props = len(implicit_functions) - 1
        n_final, random_sampling = self._final_cfg[evaluation_mode]
        intermediate = self._intermediate_cfg[evaluation_mode]
        if len(intermediate) != n_props - 1:
            raise ValueError(
                f"{n_props} proposal passes need {n_props - 1} intermediate point counts, "
                f"got {len(intermediate)} (the first pass uses the ray sampler's depths)"
            )
        pts_schedule = list(intermediate) + [n_final]

        # sampler-level per-ray bounds: the s-normalization domain of the
        # distortion loss (the published g(near)/g(far); the resampled
        # final lengths no longer span it — ops/proposal.py docstring)
        s_near, s_far = lengths[..., :1], lengths[..., -1:]

        histograms = []  # (lengths, weights) per proposal pass
        for k in range(n_props):
            refine_rng = None
            if rng is not None:
                rng, refine_rng = jax.random.split(rng)
            prop_out = implicit_functions[k](origins, directions, lengths, **kwargs)
            prop_out = _compositing_cast(self.eval_compositing_dtype, evaluation_mode, prop_out)
            prop_weights, _ = emission_absorption_weights(
                prop_out["rays_densities"],
                lengths,
                directions,
                **self.weights_kwargs,
            )
            prop_weights = prop_weights.astype(jnp.float32)
            histograms.append((lengths, prop_weights))
            bundle = refine_ray_points(
                refine_rng,
                origins,
                directions,
                lengths,
                xys,
                prop_weights,
                n_pts_per_ray=pts_schedule[k],
                random_sampling=random_sampling,
                add_input_samples=False,
                stratified_u=True,
            )
            lengths = bundle.lengths

        noise_rng = None
        if rng is not None:
            rng, noise_rng = jax.random.split(rng)
        density_noise_std = (
            self.density_noise_std_train if evaluation_mode == EvaluationMode.TRAINING else 0.0
        )
        model_out = implicit_functions[-1](origins, directions, lengths, **kwargs)
        cast_out = _compositing_cast(self.eval_compositing_dtype, evaluation_mode, model_out)
        features, depths, alpha_masks, weights = emission_absorption(
            cast_out["rays_densities"],
            cast_out["rays_features"],
            ray_lengths=lengths,
            ray_directions=directions,
            density_noise_std=density_noise_std,
            rng=noise_rng,
            bg_color=bg_color,
            **self.raymarcher_kwargs,
        )

        if self.eval_compositing_dtype is not None:
            features, depths, alpha_masks, weights = (
                x.astype(jnp.float32) for x in (features, depths, alpha_masks, weights)
            )
        loss = None
        for prop_lengths, prop_weights in histograms:
            term = interlevel_loss(
                lengths, weights, prop_lengths, prop_weights, eps=self.interlevel_loss_eps
            )
            loss = term if loss is None else loss + term
        loss = loss / float(n_props)

        aux = dict(model_out.get("aux", {}))
        aux["weights"] = weights
        aux["loss_proposal"] = loss
        # mip-NeRF 360's anti-floater regularizer over the final pass;
        # inert unless weighted via pipeline.loss_weights["loss_distortion"]
        aux["loss_distortion"] = distortion_loss(
            lengths, weights, in_disparity=self.distortion_in_disparity,
            near=s_near, far=s_far,
        )
        return RendererOutput(
            features=features, depths=depths, alpha_masks=alpha_masks, aux=aux, prev_stage=None
        )
