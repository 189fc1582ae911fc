"""Camera -> RayBundle sampling stage.

Behavioural reference: ``RaySampler``/``_RaySampler`` at
/root/reference/yanerf/pipelines/ray_samplers/ray_sampler.py:10-246.

TPU-first deviations (all jit-driven, documented here once):
  * pixel selection uses Gumbel-top-k (ops/sampling.py) instead of
    ``torch.multinomial`` — identical distribution for sampling without
    replacement;
  * the number of rays must be static: when a ``mask`` is given without
    ``n_rays_per_image``/constructor default, the reference derives the count
    from ``mask.sum()`` (data-dependent shape); here that raises instead;
  * randomness comes from explicit ``jax.random`` keys.

As in the reference, the principal point is always computed from the
constructor ``image_width/height`` even when a per-call override changes the
sampled grid size (ray_sampler.py:236-239).
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from yanerf_tpu.ops.rays import get_min_max_depth_bounds, get_xy_grid, ndc_ray_bundle, xy_to_ray_bundle
from yanerf_tpu.ops.sampling import (
    uniform_sample_with_replacement,
    weighted_sample_with_replacement,
    weighted_sample_without_replacement,
)
from yanerf_tpu.ops.structures import EvaluationMode, RayBundle, RenderSamplingMode

from .builder import RAY_SAMPLERS


class _RaySampler:
    """One sampling configuration (the train/eval halves of ``RaySampler``)."""

    def __init__(
        self,
        *,
        image_width: int,
        image_height: int,
        n_pts_per_ray: int,
        min_depth: float,
        max_depth: float,
        n_rays_per_image: Optional[int] = None,
        stratified_sampling: bool = False,
        approx_top_k: bool = False,
        pixel_replacement: bool = False,
        sample_in_disparity: bool = False,
        scene_aabb=None,
        occupancy=None,
        occupancy_n_probe: int = 128,
    ) -> None:
        self.image_width = image_width
        self.image_height = image_height
        self.n_pts_per_ray = n_pts_per_ray
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.n_rays_per_image = n_rays_per_image
        self.stratified_sampling = stratified_sampling
        self.approx_top_k = approx_top_k
        self.pixel_replacement = pixel_replacement
        self.sample_in_disparity = sample_in_disparity
        self.scene_aabb = scene_aabb
        self.occupancy = occupancy
        self.occupancy_n_probe = occupancy_n_probe

    def __call__(
        self,
        rng: Optional[jax.Array],
        poses: jax.Array,
        focal_lengths: jax.Array,
        *,
        image_height: Optional[int] = None,
        image_width: Optional[int] = None,
        mask: Optional[jax.Array] = None,
        sampling_prob_mask: Optional[jax.Array] = None,
        min_depth=None,
        max_depth=None,
        n_rays_per_image: Union[None, int, List[int]] = None,
        n_pts_per_ray: Optional[int] = None,
        stratified_sampling: Optional[bool] = None,
    ) -> RayBundle:
        batch_size = poses.shape[0]
        poses = poses[:, :3, :4]

        if image_height is None or image_width is None:
            image_height, image_width = self.image_height, self.image_width
        xy_grid = jnp.broadcast_to(
            get_xy_grid(image_height, image_width), (batch_size, image_height, image_width, 2)
        )

        num_rays = n_rays_per_image if n_rays_per_image is not None else self.n_rays_per_image
        if mask is not None and num_rays is None:
            raise ValueError(
                "A sampling mask requires a static ray count: set "
                "`n_rays_per_image` (per call or in the config); deriving it "
                "from mask.sum() would create data-dependent shapes under jit."
            )

        depth_rng = rng
        if num_rays is not None:
            if rng is None:
                raise ValueError("Monte-Carlo ray sampling requires an rng key")
            # independent streams: Threefry bits are a pure function of the
            # key, so reusing one key for pixel selection AND the stratified
            # depth jitter would couple a ray's pixel index to its jitter
            # deterministically every step (a systematic sampling bias)
            rng, depth_rng = jax.random.split(rng)
            uniform = mask is None and sampling_prob_mask is None
            if mask is not None:
                assert mask.shape == xy_grid.shape[:3], f"{mask.shape} vs {xy_grid.shape[:3]}"
                weights = mask.reshape(batch_size, -1)
            else:
                weights = jnp.ones((batch_size, image_height * image_width), dtype=xy_grid.dtype)

            if sampling_prob_mask is not None:
                if sampling_prob_mask.shape == xy_grid.shape[:3]:
                    weights = weights * sampling_prob_mask.reshape(batch_size, -1)
                elif sampling_prob_mask.ndim == 4:
                    # Multi-layer sampling: one ray budget per probability layer.
                    if isinstance(num_rays, int):
                        num_rays = [num_rays]
                    if sampling_prob_mask[:, 0].shape != xy_grid.shape[:3]:
                        raise ValueError(
                            f"Invalid sampling_prob_mask shape {sampling_prob_mask.shape}; "
                            f"must align with {xy_grid.shape}"
                        )
                    if sampling_prob_mask.shape[1] != len(num_rays):
                        raise ValueError(
                            f"sampling_prob_mask has {sampling_prob_mask.shape[1]} layers "
                            f"but len(n_rays_per_image) == {len(num_rays)}"
                        )
                    num_layers = len(num_rays)
                    weights = weights[:, None, :] * sampling_prob_mask.reshape(batch_size, num_layers, -1)
                else:
                    raise ValueError(
                        f"Invalid sampling_prob_mask of shape {sampling_prob_mask.shape}; "
                        "want (B, H, W) or (B, L, H, W)"
                    )

            def select(key, w, n):
                # pixel_replacement: replacement sampling instead of the
                # 640k-key (approx) top-k sort — the profiled throughput
                # option (ops/sampling.py); the uniform (no-mask) case is
                # a bare randint
                if self.pixel_replacement:
                    if uniform:
                        return uniform_sample_with_replacement(key, w.shape[0], w.shape[-1], n)
                    return weighted_sample_with_replacement(key, w, n)
                return weighted_sample_without_replacement(key, w, n, approx=self.approx_top_k)

            if weights.ndim == 2:
                if not isinstance(num_rays, (int, np.integer)):
                    raise ValueError(
                        f"n_rays_per_image={num_rays!r} is a list, which requires a "
                        "(B, L, H, W) multi-layer sampling_prob_mask (one ray budget "
                        "per probability layer); pass an int for single-layer sampling"
                    )
                rays_idx = select(rng, weights, int(num_rays))
            else:
                layer_keys = jax.random.split(rng, weights.shape[1])
                rays_idx = jnp.concatenate(
                    [
                        select(layer_keys[layer], weights[:, layer], int(n))
                        for layer, n in enumerate(num_rays)
                    ],
                    axis=-1,
                )
            xy_flat = xy_grid.reshape(batch_size, -1, 2)
            xy_grid = jnp.take_along_axis(xy_flat, rays_idx[..., None], axis=1)[:, :, None]

        min_depth = min_depth if min_depth is not None else self.min_depth
        max_depth = max_depth if max_depth is not None else self.max_depth
        n_pts = n_pts_per_ray if n_pts_per_ray is not None else self.n_pts_per_ray
        stratified = stratified_sampling if stratified_sampling is not None else self.stratified_sampling

        return xy_to_ray_bundle(
            poses,
            self.image_width,
            self.image_height,
            focal_lengths,
            xy_grid,
            min_depth,
            max_depth,
            n_pts,
            stratified,
            rng=depth_rng,
            sample_in_disparity=self.sample_in_disparity,
            scene_aabb=self.scene_aabb,
            occupancy=self.occupancy,
            occupancy_n_probe=self.occupancy_n_probe,
        )


@RAY_SAMPLERS.register_module()
class RaySampler:
    def __init__(
        self,
        image_width: int = 400,
        image_height: int = 400,
        scene_center: Tuple[float, float, float] = (0.0, 0.0, 0.0),
        scene_extent: float = 0.0,
        sampling_mode_training: str = "mask_sample",
        sampling_mode_evaluation: str = "full_grid",
        n_pts_per_ray_training: int = 64,
        n_pts_per_ray_evaluation: int = 64,
        n_rays_per_image_sampled_from_mask: int = 1024,
        min_depth: float = 0.1,
        max_depth: float = 8.0,
        stratified_point_sampling_training: bool = True,
        stratified_point_sampling_evaluation: bool = False,
        approx_top_k: bool = False,
        pixel_replacement: bool = False,
        use_ndc: bool = False,
        ndc_near: float = 1.0,
        sample_in_disparity: bool = False,
        scene_aabb: Optional[List[float]] = None,
        scene_aabb_eval_only: bool = False,
        occupancy_grid: Optional[str] = None,
        occupancy_n_probe: int = 128,
        occupancy_eval_only: bool = True,
        occupancy_coarse_factor: int = 4,
        occupancy_n_probe_coarse: int = 32,
        occupancy_n_probe_fine: int = 64,
        occupancy_block: int = 2,
    ) -> None:
        self.image_width = image_width
        self.image_height = image_height
        self.scene_center = tuple(scene_center)
        self.scene_extent = scene_extent
        # NDC re-parametrization for forward-facing scenes (ops/rays.py:
        # ndc_ray_bundle). When on, depth sampling is forced to [0, 1] (the
        # NDC ray parameter) and per-image metric bounds are ignored.
        self.use_ndc = use_ndc
        self.ndc_near = ndc_near
        # Optional content box [x0, y0, z0, x1, y1, z1]: per-ray depth
        # tightening via slab intersection (ops/rays.py::ray_aabb_bounds).
        # Fit from a trained model with scripts/fit_aabb.py. Meaningless
        # under the NDC reparameterization (depth is the NDC parameter).
        if scene_aabb is not None:
            if use_ndc:
                raise ValueError("scene_aabb cannot be combined with use_ndc (NDC depth is not metric)")
            scene_aabb = np.asarray(scene_aabb, np.float32).reshape(2, 3)
            if not (scene_aabb[0] < scene_aabb[1]).all():
                raise ValueError(f"scene_aabb must satisfy min < max per axis, got {scene_aabb.tolist()}")
        self.scene_aabb = scene_aabb
        # eval_only: apply the box only at evaluation — lets a config ship
        # the measured eval-time win (results/aabb_eval.json: +0.94 dB at
        # the 16-16-8 budget, free at full budget) without altering the
        # training recipe its quality numbers were measured under
        self.scene_aabb_eval_only = bool(scene_aabb_eval_only)
        # Optional occupancy-grid empty-space skipping (ops/occupancy.py):
        # a .npz produced by scripts/fit_occupancy.py from a trained
        # checkpoint. Captured as a compile-time constant, like scene_aabb.
        # Eval-only by default: the grid is only valid for the density
        # field it was fitted to, so a training run that moves the density
        # would invalidate it (and the measured quality recipes train
        # without it).
        # The bounds march itself uses the cheap formulation by default
        # (coarse-to-fine grids + eval-image ray decimation,
        # ops/occupancy.py::OccupancyBoundsSpec) — the exact single-stage
        # march measured ~0.7 s/frame of pure gather cost at 800px
        # (results/occupancy_eval.json; diagnosis in docs/performance.md).
        # Set occupancy_coarse_factor=1 AND occupancy_block=1 to force the
        # exact path (then occupancy_n_probe is the probe count).
        self.occupancy = None
        if occupancy_grid is not None:
            if use_ndc:
                raise ValueError(
                    "occupancy_grid cannot be combined with use_ndc (NDC depth is not metric)"
                )
            from yanerf_tpu.ops.occupancy import (
                OccupancyBoundsSpec,
                coarsen_occupancy,
                load_occupancy,
            )

            grid = load_occupancy(occupancy_grid)
            if int(occupancy_coarse_factor) <= 1 and int(occupancy_block) <= 1:
                self.occupancy = grid  # exact single-stage march
            else:
                self.occupancy = OccupancyBoundsSpec(
                    grid=grid,
                    coarse=(
                        coarsen_occupancy(grid, int(occupancy_coarse_factor))
                        if int(occupancy_coarse_factor) > 1
                        else None
                    ),
                    n_probe=int(occupancy_n_probe_fine),
                    n_probe_coarse=int(occupancy_n_probe_coarse),
                    block=int(occupancy_block),
                )
        self.occupancy_n_probe = int(occupancy_n_probe)
        self.occupancy_eval_only = bool(occupancy_eval_only)
        self._sampling_mode = {
            EvaluationMode.TRAINING: RenderSamplingMode(sampling_mode_training),
            EvaluationMode.EVALUATION: RenderSamplingMode(sampling_mode_evaluation),
        }
        self._raysamplers = {
            mode: _RaySampler(
                image_width=image_width,
                image_height=image_height,
                n_pts_per_ray=n_pts,
                min_depth=min_depth,
                max_depth=max_depth,
                n_rays_per_image=(
                    n_rays_per_image_sampled_from_mask
                    if self._sampling_mode[mode] == RenderSamplingMode.MASK_SAMPLE
                    else None
                ),
                stratified_sampling=stratified,
                approx_top_k=approx_top_k,
                pixel_replacement=pixel_replacement,
                # uniform-in-disparity depth spacing for unbounded scenes
                # (pairs with the models' contract_coords)
                sample_in_disparity=sample_in_disparity,
                scene_aabb=(
                    None
                    if self.scene_aabb_eval_only and mode == EvaluationMode.TRAINING
                    else self.scene_aabb
                ),
                occupancy=(
                    None
                    if self.occupancy_eval_only and mode == EvaluationMode.TRAINING
                    else self.occupancy
                ),
                occupancy_n_probe=self.occupancy_n_probe,
            )
            for mode, n_pts, stratified in (
                (EvaluationMode.TRAINING, n_pts_per_ray_training, stratified_point_sampling_training),
                (EvaluationMode.EVALUATION, n_pts_per_ray_evaluation, stratified_point_sampling_evaluation),
            )
        }

    def sampling_mode(self, evaluation_mode: EvaluationMode) -> RenderSamplingMode:
        return self._sampling_mode[evaluation_mode]

    def __call__(
        self,
        rng: Optional[jax.Array],
        poses: jax.Array,
        focal_lengths: jax.Array,
        evaluation_mode: EvaluationMode,
        *,
        mask: Optional[jax.Array] = None,
        sampling_prob_mask: Optional[jax.Array] = None,
        image_height: Optional[int] = None,
        image_width: Optional[int] = None,
        min_depth=None,
        max_depth=None,
        n_rays_per_image: Union[None, int, List[int]] = None,
    ) -> RayBundle:
        sample_mask = None
        if self._sampling_mode[evaluation_mode] == RenderSamplingMode.MASK_SAMPLE and mask is not None:
            target_h = image_height if image_height is not None else self.image_height
            target_w = image_width if image_width is not None else self.image_width
            # mask is (B, 1, H0, W0); nearest-resize to the sampling grid.
            sample_mask = jax.image.resize(
                mask, (mask.shape[0], mask.shape[1], target_h, target_w), method="nearest"
            )[:, 0]

        if self.use_ndc:
            # The NDC ray parameter spans [0, 1] from the near plane to
            # infinity; metric depth bounds do not apply.
            min_depth, max_depth = 0.0, 1.0
        elif min_depth is None and max_depth is None and self.scene_extent > 0.0:
            min_depth, max_depth = get_min_max_depth_bounds(
                poses, jnp.asarray(self.scene_center, dtype=poses.dtype), self.scene_extent
            )

        bundle = self._raysamplers[evaluation_mode](
            rng,
            poses,
            focal_lengths,
            mask=sample_mask,
            sampling_prob_mask=sampling_prob_mask,
            min_depth=min_depth,
            max_depth=max_depth,
            n_rays_per_image=n_rays_per_image,
            image_height=image_height,
            image_width=image_width,
        )
        if self.use_ndc:
            bundle = ndc_ray_bundle(
                bundle, self.image_width, self.image_height, focal_lengths, near=self.ndc_near
            )
        return bundle
