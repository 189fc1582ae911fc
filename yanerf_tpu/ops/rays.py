"""Camera-to-ray geometry, as pure jnp functions.

Behavioural reference (numerics must match in float32):
  * ``get_xy_grid`` — reference yanerf/pipelines/ray_samplers/utils.py:12-24
  * ``xy_to_ray_bundle`` — reference ray_samplers/ray_sampler.py:249-314
  * ``jiggle_within_stratas`` — reference ray_samplers/ray_sampler.py:361-386
  * ``ray_bundle_to_ray_points`` — reference pipelines/models/utils.py:214-245
  * ``get_min_max_depth_bounds`` — reference ray_samplers/ray_sampler.py:389-401

All functions are shape-polymorphic over leading/spatial dims, take explicit
``jax.random`` keys for stochastic parts, and contain no Python-level data
dependence so they trace cleanly under ``jit``.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .structures import RayBundle


@lru_cache(maxsize=32)
def _xy_grid_np(image_height: int, image_width: int) -> np.ndarray:
    ys, xs = np.meshgrid(
        np.arange(image_height, dtype=np.float32),
        np.arange(image_width, dtype=np.float32),
        indexing="ij",
    )
    return np.stack([xs, ys], axis=-1)


def get_xy_grid(image_height: int, image_width: int) -> jax.Array:
    """Pixel-coordinate grid of shape ``(H, W, 2)``; ``[..., 0]`` is x (column)."""
    return jnp.asarray(_xy_grid_np(image_height, image_width))


def jiggle_within_stratas(rng: jax.Array, bin_centers: jax.Array) -> jax.Array:
    """Stratified resampling: one uniform sample per bin around each center.

    Each value ``z`` is replaced by a uniform draw on ``[z - d-, z + d+]`` where
    the deltas are half-distances to the neighbouring centers (zero at the ends).
    """
    mids = 0.5 * (bin_centers[..., 1:] + bin_centers[..., :-1])
    upper = jnp.concatenate([mids, bin_centers[..., -1:]], axis=-1)
    lower = jnp.concatenate([bin_centers[..., :1], mids], axis=-1)
    u = jax.random.uniform(rng, lower.shape, dtype=lower.dtype)
    return lower + (upper - lower) * u


def ray_aabb_bounds(
    origins: jax.Array,
    directions: jax.Array,
    aabb: jax.Array,
    min_depth: jax.Array,
    max_depth: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Per-ray depth bounds tightened to an axis-aligned box (slab test).

    Intersects ``origin + t * direction`` with ``aabb`` in the SAME ``t``
    parameterization the ray bundle's ``lengths`` use (directions stay
    unnormalized — their norm carries the depth->distance scale, see
    ``xy_to_ray_bundle``). Branch-free and fully vectorized: fuses into
    ray generation under jit with no gathers, so tightening is ~free.

    Rays that miss the box get the empty interval ``[max_depth, max_depth]``
    — every sample lands at the far plane, outside the (density-containing)
    box, so the raymarcher composites pure background there.

    Args:
        origins/directions: ``(..., 3)``.
        aabb: ``(2, 3)`` — ``[[x0, y0, z0], [x1, y1, z1]]`` in world space.
        min_depth/max_depth: scalar (possibly traced) outer depth bounds;
            the returned interval is clamped inside them.

    Returns:
        ``(t_near, t_far)`` each shaped ``(...,)`` with
        ``min_depth <= t_near <= t_far <= max_depth``.
    """
    dtype = origins.dtype
    aabb = jnp.asarray(aabb, dtype).reshape(2, 3)
    d = directions
    # safe divisor: where d == 0 the slab test degenerates to an
    # inside-the-slab check; the quotient computed with the dummy divisor
    # is discarded by the `where` below (no NaN/inf reaches the output)
    parallel = d == 0
    safe_d = jnp.where(parallel, jnp.ones_like(d), d)
    t_a = (aabb[0] - origins) / safe_d
    t_b = (aabb[1] - origins) / safe_d
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    inside_slab = (origins >= aabb[0]) & (origins <= aabb[1])
    enter_ax = jnp.where(parallel, jnp.where(inside_slab, -big, big), jnp.minimum(t_a, t_b))
    exit_ax = jnp.where(parallel, jnp.where(inside_slab, big, -big), jnp.maximum(t_a, t_b))
    t_near = jnp.max(enter_ax, axis=-1)
    t_far = jnp.min(exit_ax, axis=-1)
    min_d = jnp.asarray(min_depth, dtype)
    max_d = jnp.asarray(max_depth, dtype)
    t_near = jnp.clip(t_near, min_d, max_d)
    t_far = jnp.clip(t_far, min_d, max_d)
    miss = t_far <= t_near
    t_near = jnp.where(miss, max_d, t_near)
    t_far = jnp.where(miss, max_d, t_far)
    return t_near, t_far


def xy_to_ray_bundle(
    poses: jax.Array,
    image_width: int,
    image_height: int,
    focal_lengths: jax.Array,
    xy_grid: jax.Array,
    min_depth: Union[float, jax.Array],
    max_depth: Union[float, jax.Array],
    n_pts_per_ray: int,
    stratified_sampling: bool = False,
    rng: Optional[jax.Array] = None,
    sample_in_disparity: bool = False,
    scene_aabb: Optional[jax.Array] = None,
    occupancy=None,
    occupancy_n_probe: int = 128,
) -> RayBundle:
    """Unproject pixel coordinates into world-space rays with depth samples.

    Args:
        poses: ``(B, 3, 4)`` camera-to-world matrices (rotation | translation).
        image_width/image_height: the *intrinsic* sensor size used for the
            principal point — note this is the sampler's static size, even when
            ``xy_grid`` covers a different (overridden) resolution, matching the
            reference semantics.
        focal_lengths: ``(B,)`` or ``(B, 1)`` focal lengths in pixels.
        xy_grid: ``(B, *spatial, 2)`` pixel coordinates to unproject.
        min_depth/max_depth: scalars (possibly traced) bounding the depth range.
        n_pts_per_ray: number of depth samples per ray (0 for none).
        stratified_sampling: jiggle samples within strata (requires ``rng``).
        sample_in_disparity: space depth samples linearly in INVERSE depth
            (uniform in disparity) instead of linearly in depth — the right
            spacing for unbounded scenes where ``max_depth >> min_depth``
            (mip-NeRF 360's choice; pairs with ``contract_points``). The
            stratified jiggle still operates on the resulting non-uniform
            bins (``jiggle_within_stratas`` uses neighbour mid-points).
        scene_aabb: optional ``(2, 3)`` world-space box bounding the scene
            content. When given, each ray's depth range is tightened to its
            slab intersection with the box (``ray_aabb_bounds``) — the same
            fixed sample budget concentrates where the scene actually is,
            and rays that miss the box collapse to the far plane
            (= background). Static shapes throughout.
        occupancy: optional ``ops.occupancy.OccupancyGrid`` (exact
            single-stage march) or ``OccupancyBoundsSpec`` (the cheap
            coarse-to-fine / ray-decimated formulation). When given, each
            ray's depth interval is further tightened to the occupied span
            along the ray (``ops.occupancy.occupancy_bounds``) —
            empty-space skipping with static shapes. Applied inside the
            ``scene_aabb`` bounds when both are set.
        occupancy_n_probe: probes per ray for the single-stage march
            (ignored when ``occupancy`` is a spec, which carries its own
            probe counts).

    Returns:
        A :class:`RayBundle` with origins/directions ``(B, *spatial, 3)``,
        lengths ``(B, *spatial, n_pts_per_ray)``, xys ``(B, *spatial, 2)``.
        Directions are NOT normalized (their norm carries the depth->distance
        scale used by the raymarcher).
    """
    batch_size = xy_grid.shape[0]
    spatial_size = xy_grid.shape[1:-1]
    dtype = xy_grid.dtype

    poses = poses[:, :3, :4]
    expand = (batch_size,) + (1,) * len(spatial_size)
    origins = jnp.broadcast_to(poses[:, :3, 3].reshape(*expand, 3), (batch_size, *spatial_size, 3))

    focal = jnp.reshape(focal_lengths, expand)
    dirs_cam = jnp.stack(
        [
            (xy_grid[..., 0] - image_width * 0.5) / focal,
            (xy_grid[..., 1] - image_height * 0.5) / focal,
            jnp.ones((batch_size, *spatial_size), dtype=dtype),
        ],
        axis=-1,
    )
    rot = poses[:, :3, :3].reshape(*expand, 3, 3)
    directions = jnp.sum(rot * dirs_cam[..., None, :], axis=-1)

    if n_pts_per_ray > 0:
        min_d = jnp.mean(jnp.asarray(min_depth, dtype=dtype))
        max_d = jnp.mean(jnp.asarray(max_depth, dtype=dtype))
        if scene_aabb is not None:
            # per-ray bounds: (B, *spatial) each; scalars otherwise
            lo, hi = ray_aabb_bounds(origins, directions, scene_aabb, min_d, max_d)
        else:
            lo, hi = min_d, max_d
        if occupancy is not None:
            from .occupancy import occupancy_bounds

            lo, hi = occupancy_bounds(
                origins, directions, occupancy, lo, hi, n_probe=occupancy_n_probe
            )
        t = jnp.linspace(0.0, 1.0, n_pts_per_ray, dtype=dtype)
        if sample_in_disparity:
            # disparity spacing divides by the bounds; a non-positive near
            # plane (the pointwise default in some blender configs) would
            # silently yield inf/NaN depths — clamp to a tiny positive value
            lo = jnp.maximum(jnp.asarray(lo, dtype), 1e-6)
            hi = jnp.maximum(jnp.asarray(hi, dtype), lo * (1.0 + 1e-6))
            depths = 1.0 / (t * (1.0 / hi - 1.0 / lo)[..., None] + (1.0 / lo)[..., None])
        else:
            depths = t * jnp.asarray(hi - lo, dtype)[..., None] + jnp.asarray(lo, dtype)[..., None]
        rays_zs = jnp.broadcast_to(depths, (batch_size, *spatial_size, n_pts_per_ray))
        if stratified_sampling:
            if rng is None:
                raise ValueError("stratified_sampling requires an rng key")
            rays_zs = jiggle_within_stratas(rng, rays_zs)
    else:
        rays_zs = jnp.zeros((batch_size, *spatial_size, 0), dtype=dtype)

    return RayBundle(origins=origins, directions=directions, lengths=rays_zs, xys=xy_grid)


def ndc_ray_bundle(
    bundle: RayBundle,
    image_width: int,
    image_height: int,
    focal_lengths: jax.Array,
    near: float = 1.0,
) -> RayBundle:
    """Re-parametrize world-space rays into normalized device coordinates.

    The classic forward-facing NeRF NDC warp (Mildenhall et al. 2020,
    appendix C), adapted to this repo's +z-forward camera convention. Rays
    are first advanced to the ``z = near`` plane, then mapped so that the
    ray parameter ``t' in [0, 1]`` sweeps the frustum from the near plane to
    infinity:

        o' = (f_x * ox/oz, f_y * oy/oz, 1 - 2*near/oz)
        d' = (f_x * (dx/dz - ox/oz), f_y * (dy/dz - oy/oz), 2*near/oz)

    with ``f_x = 2*focal/W``, ``f_y = 2*focal/H``. The point at parameter
    ``t`` on the world ray lands at ``t' = 1 - oz/(oz + t*dz)`` on the NDC
    ray, so sampling lengths uniformly in [0, 1] is uniform in disparity.

    The reference framework has NO NDC path (its LLFF loader returns metric
    per-image depth bounds, llff_dataset.py:52-54); this is the opt-in
    parametrization BASELINE.json names for forward-facing scenes.

    Args:
        bundle: world-space rays; ``lengths`` are expected in [0, 1] and are
            passed through unchanged.
        image_width/image_height: sensor size in pixels.
        focal_lengths: ``(B,)`` or ``(B, 1)`` focal lengths in pixels.
        near: world-space distance of the near plane (LLFF convention: 1.0
            after bd_factor rescaling).

    Returns:
        A :class:`RayBundle` with NDC origins/directions; directions remain
        unnormalized (the raymarcher's delta scaling uses their norm).
    """
    origins, directions = bundle.origins, bundle.directions
    expand = (origins.shape[0],) + (1,) * (origins.ndim - 2)
    focal = jnp.reshape(focal_lengths, expand).astype(origins.dtype)

    # The warp needs a designated facing axis. In the recentered LLFF world
    # frame cameras look along -z (datasets/llff.py recenters about the
    # average camera, whose back vector is +z), while the formulas below are
    # written for +z-forward — so work in a frame with z flipped to whichever
    # sign the rays actually face (a pure relabeling; the batch faces one way
    # by the forward-facing assumption NDC itself requires).
    s = jnp.sign(jnp.sum(directions[..., 2]))
    # exactly-cancelling dz components would give s == 0 -> division by zero
    # below; such a batch violates the forward-facing assumption anyway, so
    # fall back to +z rather than emit NaNs
    s = jnp.where(s == 0, 1.0, s)

    # Advance origins to the near plane (t = (near - s*oz) / (s*dz)).
    t_near = (near - s * origins[..., 2]) / (s * directions[..., 2])
    origins = origins + t_near[..., None] * directions

    ox, oy = origins[..., 0], origins[..., 1]
    dx, dy = directions[..., 0], directions[..., 1]
    oz = s * origins[..., 2]
    dz = s * directions[..., 2]
    fx = 2.0 * focal / float(image_width)
    fy = 2.0 * focal / float(image_height)

    o_ndc = jnp.stack([fx * ox / oz, fy * oy / oz, 1.0 - 2.0 * near / oz], axis=-1)
    d_ndc = jnp.stack(
        [fx * (dx / dz - ox / oz), fy * (dy / dz - oy / oz), 2.0 * near / oz],
        axis=-1,
    )
    return RayBundle(origins=o_ndc, directions=d_ndc, lengths=bundle.lengths, xys=bundle.xys)


def ray_bundle_to_ray_points(
    rays_origins: jax.Array,
    rays_directions: jax.Array,
    rays_lengths: jax.Array,
) -> jax.Array:
    """``points[..., p, :] = origin + length[..., p] * direction`` — ``(..., P, 3)``."""
    return rays_origins[..., None, :] + rays_lengths[..., :, None] * rays_directions[..., None, :]


def contract_points(points: jax.Array, eps: float = 1e-9) -> jax.Array:
    """mip-NeRF 360 scene contraction: map all of R^3 into the radius-2 ball.

        contract(x) = x                      if |x| <= 1
                      (2 - 1/|x|) * x/|x|    otherwise

    Identity inside the unit ball; the infinite exterior compresses smoothly
    into the shell 1 < |x| < 2, so a fixed-bandwidth positional encoding can
    represent unbounded scenes. Opt-in per model (``contract_coords``);
    pairs with ``sample_in_disparity`` in the ray sampler. The reference has
    no unbounded-scene handling (its real_360 path samples metric bounds).
    """
    # double-where so the unselected branch never produces NaN cotangents
    # (norm's gradient at the origin is NaN; 1/norm's explodes near it)
    norm_sq = jnp.sum(points * points, axis=-1, keepdims=True)
    inside = norm_sq <= 1.0
    norm = jnp.sqrt(jnp.maximum(norm_sq, eps * eps))
    safe = jnp.where(inside, jnp.ones_like(norm), norm)
    contracted = (2.0 - 1.0 / safe) * (points / safe)
    return jnp.where(inside, points, contracted)


def get_min_max_depth_bounds(
    poses: jax.Array,
    scene_center: jax.Array,
    scene_extent: float,
) -> Tuple[jax.Array, jax.Array]:
    """Near/far planes from camera distance to the scene center ± extent.

    Accepts (B, 3, 4) or (B, 4, 4) camera-to-world poses (the reference only
    handles 3x4; ray_sampler.py:389-401).
    """
    cam_center = poses[:, :3, -1]
    projected_center = jnp.einsum("bij,j->bi", poses[:, :3, :3], scene_center)
    center_dist = jnp.sqrt(jnp.clip(jnp.sum((cam_center - projected_center) ** 2, axis=-1), min=0.001))
    center_dist = jnp.clip(center_dist, min=scene_extent + 1e-3)
    return jnp.mean(center_dist - scene_extent), jnp.mean(center_dist + scene_extent)
