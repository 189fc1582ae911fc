"""Occupancy-grid empty-space skipping for evaluation rendering.

The CUDA-native version of this idea (NerfAcc / Instant-NGP) maintains a
binary voxel grid and *compacts* samples to skip empty space — dynamic
shapes, scatter/gather heavy, wrong for XLA. The TPU-native formulation
keeps every shape static: a post-training occupancy grid tightens each
ray's depth interval to the first/last occupied voxel along the ray, so
the SAME fixed per-ray sample budget concentrates where the scene content
actually is. Fewer points then buy the same quality (the fps lever), or
the same points buy more quality.

This generalizes the scene-AABB slab tightening (ops/rays.py::
ray_aabb_bounds, one box for the whole scene) to per-ray bounds that hug
the content: a ray grazing the corner of the scene box but missing the
object collapses to (near) background, and a ray hitting a thin structure
gets an interval a few voxels wide instead of the whole box chord.

The reference framework has no empty-space skipping (its eval samples the
full [min_depth, max_depth] chord on every ray; ray_sampler.py:389-401);
this is an eval-only opt-in on top of its semantics.

Pipeline:
  1. train a model;
  2. ``scripts/fit_occupancy.py`` evaluates its density on a lattice
     (ops/mesh.py::evaluate_density_grid), thresholds + dilates it into a
     binary grid, and saves ``{occupancy, aabb, threshold}`` to ``.npz``;
  3. configs opt in via ``ray_sampler: {occupancy_grid: <path.npz>}`` —
     the sampler captures the grid as a compile-time constant (like
     ``scene_aabb``) and tightens eval bounds with
     :func:`occupancy_ray_bounds`.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


class OccupancyGrid(NamedTuple):
    """A binary occupancy lattice over a world-space box.

    Attributes:
        grid: ``(Rx, Ry, Rz) uint8`` — nonzero where the (dilated) density
            exceeded the build threshold; index order [ix, iy, iz] with
            index 0 at ``aabb[0]`` (cell-centered voxels).
        aabb: ``(2, 3) float32`` world-space box the grid spans.
    """

    grid: Union[np.ndarray, jax.Array]
    aabb: Union[np.ndarray, jax.Array]


def _dilate_binary(occ: np.ndarray, radius: int) -> np.ndarray:
    """Binary max-pool (radius voxels, 6-neighborhood per step) of a 3D mask."""
    occ = occ.astype(bool)
    for _ in range(int(radius)):
        grown = occ.copy()
        for ax in range(3):
            grown[tuple(slice(None, -1) if i == ax else slice(None) for i in range(3))] |= occ[
                tuple(slice(1, None) if i == ax else slice(None) for i in range(3))
            ]
            grown[tuple(slice(1, None) if i == ax else slice(None) for i in range(3))] |= occ[
                tuple(slice(None, -1) if i == ax else slice(None) for i in range(3))
            ]
        occ = grown
    return occ


def build_occupancy_grid(
    density_grid: np.ndarray,
    bounds: Tuple[float, float],
    threshold: float,
    dilate: int = 1,
) -> OccupancyGrid:
    """Threshold + dilate an evaluated density lattice into a binary grid.

    Args:
        density_grid: ``(R, R, R)`` activated densities from
            ``evaluate_density_grid`` (lattice POINTS spanning the bounds
            cube inclusively).
        bounds: the ``(lo, hi)`` cube the lattice was evaluated on.
        threshold: density cutoff (sigma units; see ``fit_scene_aabb``'s
            threshold docs — s below ~1 is visually empty at typical deltas).
        dilate: binary max-pool radius in voxels. One voxel of dilation
            covers density that peaks between lattice points and keeps the
            probe-spacing error of :func:`occupancy_ray_bounds` conservative.

    Returns:
        An :class:`OccupancyGrid` (numpy; callers move it to device).
    """
    occ = _dilate_binary(density_grid > float(threshold), int(dilate))
    lo, hi = float(bounds[0]), float(bounds[1])
    aabb = np.asarray([[lo, lo, lo], [hi, hi, hi]], np.float32)
    return OccupancyGrid(grid=occ.astype(np.uint8), aabb=aabb)


def occupancy_fraction(occ: OccupancyGrid) -> float:
    """Fraction of voxels occupied — the headroom estimate for skipping."""
    return float(np.asarray(occ.grid, np.float32).mean())


def query_occupancy(occ_grid: jax.Array, aabb: jax.Array, points: jax.Array) -> jax.Array:
    """Nearest-voxel occupancy lookup; points outside the box are empty.

    Args:
        occ_grid: ``(Rx, Ry, Rz)`` uint8/bool-like.
        aabb: ``(2, 3)``.
        points: ``(..., 3)`` world-space.

    Returns:
        ``(...,)`` bool.
    """
    dtype = points.dtype
    aabb = jnp.asarray(aabb, dtype).reshape(2, 3)
    res = jnp.asarray(occ_grid.shape, jnp.int32)
    # lattice points span the box inclusively -> nearest lattice index
    unit = (points - aabb[0]) / (aabb[1] - aabb[0])
    idx = jnp.round(unit * (res - 1).astype(dtype)).astype(jnp.int32)
    inside = jnp.all((unit >= 0.0) & (unit <= 1.0), axis=-1)
    idx = jnp.clip(idx, 0, res - 1)
    flat = (idx[..., 0] * occ_grid.shape[1] + idx[..., 1]) * occ_grid.shape[2] + idx[..., 2]
    vals = jnp.take(jnp.asarray(occ_grid).reshape(-1), flat, axis=0)
    # compare in integer space — bf16/bool select quirks on the Mosaic
    # helper never arise here (plain XLA), but keep the comparison exact
    return (vals > 0) & inside


def occupancy_ray_bounds(
    origins: jax.Array,
    directions: jax.Array,
    occ: OccupancyGrid,
    t_lo: jax.Array,
    t_hi: jax.Array,
    n_probe: int = 128,
) -> Tuple[jax.Array, jax.Array]:
    """Tighten per-ray depth bounds to the occupied span along each ray.

    Marches ``n_probe`` cell-centered probe depths across ``[t_lo, t_hi]``
    per ray (same ``t`` parameterization as the bundle's ``lengths``),
    looks each up in the occupancy grid, and returns the interval from the
    first to the last occupied probe, expanded by one probe spacing on each
    side (so content between probes stays covered — pair with one voxel of
    build-time dilation). Rays with no occupied probe collapse to
    ``[t_hi, t_hi]``: every sample lands at the far plane and the
    raymarcher composites pure background, exactly the slab-miss semantics
    of ``ray_aabb_bounds``.

    Fully dense and branch-free: one ``(..., n_probe)`` gather + reductions,
    no MLP evaluation — orders of magnitude cheaper than the samples it
    saves. Peak transient is the ``(..., n_probe)`` probe lattice; at
    800x800 eval with the default 128 probes that is ~320 MB of f32, well
    inside HBM next to the bundle's own ``lengths``.

    Args:
        origins/directions: ``(..., 3)`` (directions unnormalized, as in
            ``xy_to_ray_bundle``).
        occ: the grid (captured as a compile-time constant by the sampler).
        t_lo/t_hi: scalar or ``(...,)`` outer bounds (e.g. the slab-test
            output); the result is always inside them.
        n_probe: probes per ray. Coverage rule: with a grid of resolution
            R spanning the scene box and probes spanning a chord of it,
            ``n_probe >= R`` cannot skip an occupied+dilated voxel — the
            default (128) matches ``scripts/fit_occupancy.py``'s default
            grid resolution; lower it only together with the grid.

    Returns:
        ``(t_near, t_far)`` each shaped ``(...,)``.
    """
    dtype = origins.dtype
    lo = jnp.broadcast_to(jnp.asarray(t_lo, dtype), origins.shape[:-1])
    hi = jnp.broadcast_to(jnp.asarray(t_hi, dtype), origins.shape[:-1])
    span = hi - lo
    step = span / float(n_probe)
    k = (jnp.arange(n_probe, dtype=dtype) + 0.5) / float(n_probe)  # cell centers
    t = lo[..., None] + span[..., None] * k  # (..., n_probe)
    pts = origins[..., None, :] + t[..., :, None] * directions[..., None, :]
    hit = query_occupancy(occ.grid, occ.aabb, pts)  # (..., n_probe)

    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    t_first = jnp.min(jnp.where(hit, t, big), axis=-1)
    t_last = jnp.max(jnp.where(hit, t, -big), axis=-1)
    t_near = jnp.clip(t_first - step, lo, hi)
    t_far = jnp.clip(t_last + step, lo, hi)
    miss = ~jnp.any(hit, axis=-1)
    t_near = jnp.where(miss, hi, t_near)
    t_far = jnp.where(miss, hi, t_far)
    return t_near, t_far


def _conservative_axis_pool(g: np.ndarray, axis: int, rc: int) -> np.ndarray:
    """OR each fine slab along ``axis`` into every coarse index reachable
    by points inside that slab's voxel under :func:`query_occupancy`'s
    nearest-lattice rounding (both lattices span the same box inclusively).

    Fine voxel ``i`` owns unit coordinates ``u in [(i-0.5)/(rf-1),
    (i+0.5)/(rf-1)]``; a point there coarse-queries ``round(u*(rc-1))``,
    which ranges over ``[ceil(u_lo*(rc-1)-0.5), floor(u_hi*(rc-1)+0.5)]``
    (a superset of either round-half convention). ORing into that whole
    range makes coarse-empty => fine-empty exact by construction — no
    blanket dilation, so the coarse grid stays as tight as possible.
    """
    rf = g.shape[axis]
    out_shape = list(g.shape)
    out_shape[axis] = rc
    out = np.zeros(out_shape, bool)
    gm = np.moveaxis(g, axis, 0)
    om = np.moveaxis(out, axis, 0)
    if rf == 1 or rc == 1:
        np.logical_or.at(om, np.zeros(rf, int), gm)
        return out
    i = np.arange(rf, dtype=np.float64)
    u_lo = np.clip((i - 0.5) / (rf - 1), 0.0, 1.0)
    u_hi = np.clip((i + 0.5) / (rf - 1), 0.0, 1.0)
    j_lo = np.clip(np.ceil(u_lo * (rc - 1) - 0.5).astype(int), 0, rc - 1)
    j_hi = np.clip(np.floor(u_hi * (rc - 1) + 0.5).astype(int), 0, rc - 1)
    for off in range(int((j_hi - j_lo).max()) + 1):
        np.logical_or.at(om, np.minimum(j_lo + off, j_hi), gm)
    return out


def coarsen_occupancy(occ: OccupancyGrid, factor: int) -> OccupancyGrid:
    """Pool the binary grid by ``factor`` into a strictly conservative coarse grid.

    Used by the two-stage bounds march (:func:`occupancy_ray_bounds` run
    coarse-then-fine): a short probe march against the coarse grid finds
    the rough occupied span, and only that span is probed against the fine
    grid. Because :func:`query_occupancy` treats BOTH grids as lattice
    points spanning the same box inclusively, a plain factor-group max-pool
    is misaligned with the coarse query lattice — the nearest coarse index
    of a fine voxel can deviate +-1 from its pooling group in SEVERAL axes
    at once (diagonally), which an axis-only dilation does not cover. The
    pooling here is therefore done per axis against the query mapping
    itself (:func:`_conservative_axis_pool`): every fine voxel is ORed into
    exactly the coarse cells its points can round to, making coarse-empty
    => fine-empty exact by construction at the original
    ``ceil(res/factor)`` coarse resolution.

    Runs in numpy at grid-load time; the result is captured as a
    compile-time constant alongside the fine grid.
    """
    factor = int(factor)
    if factor <= 1:
        return occ
    g = np.asarray(occ.grid) > 0
    for axis in range(3):
        rc = max(1, -(-g.shape[axis] // factor))
        g = _conservative_axis_pool(g, axis, rc)
    return OccupancyGrid(grid=g.astype(np.uint8), aabb=np.asarray(occ.aabb, np.float32))


class OccupancyBoundsSpec(NamedTuple):
    """How to turn an occupancy grid into per-ray depth bounds.

    The exact single-stage march (:func:`occupancy_ray_bounds` with the
    fine grid and ``n_probe`` probes on every ray) costs rays x n_probe
    data-dependent gathers — measured ~0.7 s per 800x800 frame at the
    128-probe default (82M gathers; TPU gathers are issue-rate-bound, see
    docs/performance.md). This spec describes the cheap formulation:

    - ``coarse``: march ``n_probe_coarse`` probes against a max-pooled
      (conservative) coarse grid first, then ``n_probe`` fine probes only
      across the coarse span (2-4x fewer fine-grid gathers for free).
    - ``block``: on full-image eval grids, compute bounds only on every
      ``block``-th ray per image axis, take the conservative 3x3
      neighborhood union of the decimated maps, and nearest-upsample
      (block^2 x fewer rays marched; neighboring eval rays differ by
      <= ``block`` pixels of direction, which the neighborhood union plus
      the probe-spacing expansion and the grid's build-time dilation
      absorb).

    ``coarse=None`` and ``block=1`` reproduce the exact path.
    """

    grid: OccupancyGrid
    coarse: Union[OccupancyGrid, None] = None
    n_probe: int = 64
    n_probe_coarse: int = 32
    block: int = 2


def occupancy_bounds(
    origins: jax.Array,
    directions: jax.Array,
    spec: Union[OccupancyGrid, OccupancyBoundsSpec],
    t_lo: jax.Array,
    t_hi: jax.Array,
    n_probe: int = 128,
) -> Tuple[jax.Array, jax.Array]:
    """Dispatch per-ray occupancy depth bounds for a plain grid or a spec.

    A bare :class:`OccupancyGrid` runs the exact single-stage march with
    ``n_probe`` probes (legacy behavior). An :class:`OccupancyBoundsSpec`
    runs the cheap two-stage/decimated formulation (``n_probe`` arg is
    ignored; the spec carries its own probe counts). The image-decimation
    path engages only when the rays form a 2D image grid
    (``origins.shape == (B, H, W, 3)`` with H, W > block).
    """
    if isinstance(spec, OccupancyGrid):
        return occupancy_ray_bounds(origins, directions, spec, t_lo, t_hi, n_probe=n_probe)

    block = int(spec.block)
    spatial = origins.shape[1:-1]
    if block > 1 and len(spatial) == 2 and min(spatial) > block:
        return _occupancy_image_bounds(origins, directions, spec, t_lo, t_hi)
    return _two_stage_bounds(origins, directions, spec, t_lo, t_hi)


def _two_stage_bounds(origins, directions, spec: OccupancyBoundsSpec, t_lo, t_hi):
    """Coarse-grid march to find the rough span, fine-grid march inside it."""
    lo, hi = t_lo, t_hi
    if spec.coarse is not None:
        lo, hi = occupancy_ray_bounds(
            origins, directions, spec.coarse, lo, hi, n_probe=int(spec.n_probe_coarse)
        )
    return occupancy_ray_bounds(origins, directions, spec.grid, lo, hi, n_probe=int(spec.n_probe))


def _occupancy_image_bounds(origins, directions, spec: OccupancyBoundsSpec, t_lo, t_hi):
    """Bounds on a decimated image-grid ray set + conservative 3x3 union.

    origins/directions are ``(B, H, W, 3)``. Marches every ``block``-th
    ray, min/max-pools the resulting near/far maps over a 3x3 stride-1
    window (the union of each decimated ray's neighborhood — covers the
    full-res rays between the marched ones), nearest-upsamples back to
    (H, W), and clamps into each full-res ray's own outer interval. A ray
    whose whole pooled neighborhood missed keeps the miss semantics
    (bounds collapse toward its far plane -> pure background).
    """
    dtype = origins.dtype
    b = int(spec.block)
    bsz, h, w = origins.shape[:3]
    lo = jnp.broadcast_to(jnp.asarray(t_lo, dtype), (bsz, h, w))
    hi = jnp.broadcast_to(jnp.asarray(t_hi, dtype), (bsz, h, w))

    t0_d, t1_d = _two_stage_bounds(
        origins[:, ::b, ::b],
        directions[:, ::b, ::b],
        spec,
        lo[:, ::b, ::b],
        hi[:, ::b, ::b],
    )
    # The neighborhood union must treat a missed ray as an EMPTY interval,
    # not as its [hi, hi] encoding — otherwise one missing neighbor blows
    # every silhouette ray's far bound out to the far plane (and its near
    # bound down via the min-pool). Re-encode misses as (+big, -big) so
    # they are the identity of the (min, max) pooling, and restore the
    # far-plane miss semantics afterwards for all-miss neighborhoods.
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    miss_d = t1_d <= t0_d
    window = (1, 3, 3)
    ones = (1, 1, 1)
    t0_p = -jax.lax.reduce_window(
        jnp.where(miss_d, -big, -t0_d), -big, jax.lax.max, window, ones, "SAME"
    )
    t1_p = jax.lax.reduce_window(
        jnp.where(miss_d, -big, t1_d), -big, jax.lax.max, window, ones, "SAME"
    )
    t0 = jnp.repeat(jnp.repeat(t0_p, b, axis=1), b, axis=2)[:, :h, :w]
    t1 = jnp.repeat(jnp.repeat(t1_p, b, axis=1), b, axis=2)[:, :h, :w]
    all_miss = t1 <= -big * 0.5
    t0 = jnp.clip(jnp.where(all_miss, hi, t0), lo, hi)
    t1 = jnp.clip(jnp.where(all_miss, hi, t1), lo, hi)
    return jnp.minimum(t0, t1), t1


def save_occupancy(path: str, occ: OccupancyGrid, threshold: float) -> None:
    np.savez_compressed(
        path,
        occupancy=np.asarray(occ.grid, np.uint8),
        aabb=np.asarray(occ.aabb, np.float32),
        threshold=np.float32(threshold),
    )


def load_occupancy(path: str) -> OccupancyGrid:
    with np.load(path) as z:
        return OccupancyGrid(grid=z["occupancy"].astype(np.uint8), aabb=z["aabb"].astype(np.float32))
