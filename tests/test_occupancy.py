"""Occupancy-grid empty-space skipping (ops/occupancy.py + sampler wiring).

The reference has no empty-space skipping (its eval samples the full
[min_depth, max_depth] chord; ray_samplers/ray_sampler.py:389-401); these
tests pin down the TPU-native static-shape formulation: conservative
per-ray bounds, exact-identity behavior for a fully occupied grid, and the
eval-only sampler opt-in.
"""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yanerf_tpu.ops.occupancy import (
    OccupancyBoundsSpec,
    OccupancyGrid,
    build_occupancy_grid,
    coarsen_occupancy,
    load_occupancy,
    occupancy_bounds,
    occupancy_ray_bounds,
    query_occupancy,
    save_occupancy,
)
from yanerf_tpu.ops.structures import EvaluationMode
from yanerf_tpu.pipelines import RAY_SAMPLERS
from yanerf_tpu.utils import Config

CFG_DIR = osp.join(osp.dirname(__file__), "configs")


def _cams(batch=2):
    poses = jnp.broadcast_to(jnp.eye(4), (batch, 4, 4))
    focals = jnp.full((batch, 1), 5.0)
    return poses, focals


def test_query_occupancy_inside_outside():
    grid = np.zeros((8, 8, 8), np.uint8)
    grid[4, 4, 4] = 1
    aabb = np.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]], np.float32)
    # lattice point (4,4,4) sits at world 2*(4/7)-1 = 1/7
    c = 2.0 * 4.0 / 7.0 - 1.0
    pts = jnp.asarray(
        [
            [c, c, c],  # exactly the occupied lattice point
            [0.9, 0.9, 0.9],  # inside the box, empty voxel
            [1.5, 0.0, 0.0],  # outside the box entirely
        ]
    )
    hit = np.asarray(query_occupancy(jnp.asarray(grid), jnp.asarray(aabb), pts))
    assert hit.tolist() == [True, False, False]


def test_occupancy_ray_bounds_brackets_content():
    # occupy a slab z in ~[0.2, 0.5] of a [-1, 1]^3 grid
    res = 32
    axis = np.linspace(-1.0, 1.0, res)
    zz = np.broadcast_to(axis, (res, res, res))
    grid = ((zz >= 0.2) & (zz <= 0.5)).astype(np.uint8)
    occ = OccupancyGrid(grid=grid, aabb=np.asarray([[-1.0] * 3, [1.0] * 3], np.float32))

    # a ray straight down +z through the slab, and one that misses the box
    origins = jnp.asarray([[0.0, 0.0, -3.0], [5.0, 5.0, -3.0]])
    dirs = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    n_probe = 128
    t0, t1 = occupancy_ray_bounds(origins, dirs, occ, 0.1, 10.0, n_probe=n_probe)
    t0, t1 = np.asarray(t0), np.asarray(t1)
    step = (10.0 - 0.1) / n_probe
    # hitting ray: slab spans t in [3.2, 3.5]; bounds must cover it and hug
    # it to within a probe spacing + the grid's voxel rounding
    vox = 2.0 / (res - 1)
    assert t0[0] <= 3.2 + 1e-5 and t1[0] >= 3.5 - 1e-5
    assert t0[0] >= 3.2 - step - vox - 1e-5
    assert t1[0] <= 3.5 + step + vox + 1e-5
    # missing ray collapses to the far plane (background semantics)
    assert t0[1] == pytest.approx(10.0) and t1[1] == pytest.approx(10.0)


def test_full_occupancy_is_identity_bounds():
    occ = OccupancyGrid(
        grid=np.ones((16, 16, 16), np.uint8),
        aabb=np.asarray([[-100.0] * 3, [100.0] * 3], np.float32),
    )
    origins = jnp.asarray([[0.3, -0.2, 0.0]])
    dirs = jnp.asarray([[0.1, 0.2, 1.0]])
    t0, t1 = occupancy_ray_bounds(origins, dirs, occ, 0.5, 7.5, n_probe=32)
    # first probe center - step clips back to lo; last + step clips to hi
    assert float(t0[0]) == pytest.approx(0.5, abs=1e-6)
    assert float(t1[0]) == pytest.approx(7.5, abs=1e-6)


def test_build_dilate_and_roundtrip(tmp_path):
    density = np.zeros((16, 16, 16), np.float32)
    density[8, 8, 8] = 10.0
    occ0 = build_occupancy_grid(density, (-1.0, 1.0), threshold=5.0, dilate=0)
    occ1 = build_occupancy_grid(density, (-1.0, 1.0), threshold=5.0, dilate=1)
    assert occ0.grid.sum() == 1
    # one round of 6-neighbour dilation: center + 6 face neighbours
    assert occ1.grid.sum() == 7
    assert occ1.grid[8, 8, 8] == 1 and occ1.grid[7, 8, 8] == 1 and occ1.grid[8, 8, 9] == 1

    path = str(tmp_path / "occ.npz")
    save_occupancy(path, occ1, threshold=5.0)
    loaded = load_occupancy(path)
    np.testing.assert_array_equal(loaded.grid, occ1.grid)
    np.testing.assert_allclose(loaded.aabb, occ1.aabb)


def test_coarsen_occupancy_is_conservative():
    # every point that queries occupied in the fine grid must also query
    # occupied in the max-pooled+dilated coarse grid (coarse-empty =>
    # fine-empty is what makes the two-stage march safe)
    rng = np.random.default_rng(0)
    res = 33  # non-multiple of the factor exercises the padding path
    fine = OccupancyGrid(
        grid=(rng.random((res, res, res)) < 0.03).astype(np.uint8),
        aabb=np.asarray([[-2.0, -1.0, 0.0], [1.0, 2.0, 3.0]], np.float32),
    )
    coarse = coarsen_occupancy(fine, 4)
    assert max(coarse.grid.shape) <= (res + 3) // 4
    pts = rng.uniform(-2.5, 3.5, size=(4096, 3)).astype(np.float32)
    hit_f = np.asarray(query_occupancy(jnp.asarray(fine.grid), jnp.asarray(fine.aabb), jnp.asarray(pts)))
    hit_c = np.asarray(query_occupancy(jnp.asarray(coarse.grid), jnp.asarray(coarse.aabb), jnp.asarray(pts)))
    assert not (hit_f & ~hit_c).any()
    # and it is not trivially all-occupied
    assert coarse.grid.mean() < 1.0


def test_coarsen_occupancy_diagonal_corner_voxel():
    # Regression for the round-4 advisor finding: a fine voxel at a
    # pooling-group corner (index (3,3,0), res=33, factor=4) nearest-rounds
    # to coarse cell (1,1,0) — a DIAGONAL neighbor of its pooling group
    # (0,0,0) — which an axis-only dilation of the pooled grid missed, so
    # the two-stage march skipped real content. The conservative-by-
    # construction pooling must mark every coarse cell that any point of
    # the voxel can query.
    res = 33
    grid = np.zeros((res, res, res), np.uint8)
    grid[3, 3, 0] = 1
    fine = OccupancyGrid(grid=grid, aabb=np.asarray([[-1.0] * 3, [1.0] * 3], np.float32))
    coarse = coarsen_occupancy(fine, 4)
    assert coarse.grid[1, 1, 0] == 1  # the diagonal cell the old code left empty

    # every point inside the voxel (fine-occupied) must be coarse-occupied:
    # dense sample of the voxel's world-space cube (+-half a fine cell)
    c = 2.0 * np.asarray([3, 3, 0]) / (res - 1) - 1.0
    half = 1.0 / (res - 1)
    ax = np.linspace(-half, half, 9)
    off = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), axis=-1).reshape(-1, 3)
    pts = np.clip(c + off * 0.999, -1.0, 1.0).astype(np.float32)
    hit_f = np.asarray(query_occupancy(jnp.asarray(fine.grid), jnp.asarray(fine.aabb), jnp.asarray(pts)))
    hit_c = np.asarray(
        query_occupancy(jnp.asarray(coarse.grid), jnp.asarray(coarse.aabb), jnp.asarray(pts))
    )
    assert hit_f.all()
    assert hit_c[hit_f].all()
    # and the coarse grid stays tight: a single voxel marks at most 2^3 cells
    assert coarse.grid.sum() <= 8


def test_coarsen_occupancy_conservative_at_every_lattice_point():
    # exhaustive sweep: single occupied voxels at awkward positions, checked
    # against a dense point cloud jittered within half a fine voxel
    rng = np.random.default_rng(3)
    res, factor = 21, 4
    for iv in [(0, 0, 0), (3, 3, 0), (3, 3, 3), (20, 17, 19), (10, 3, 7)]:
        grid = np.zeros((res, res, res), np.uint8)
        grid[iv] = 1
        fine = OccupancyGrid(
            grid=grid, aabb=np.asarray([[-2.0, 0.0, -1.0], [2.0, 4.0, 3.0]], np.float32)
        )
        coarse = coarsen_occupancy(fine, factor)
        lo, hi = fine.aabb[0], fine.aabb[1]
        c = lo + (hi - lo) * np.asarray(iv) / (res - 1)
        half = (hi - lo) / (res - 1) / 2.0
        pts = (c + rng.uniform(-1, 1, size=(512, 3)) * half * 0.999).astype(np.float32)
        pts = np.clip(pts, lo, hi)
        hit_f = np.asarray(
            query_occupancy(jnp.asarray(fine.grid), jnp.asarray(fine.aabb), jnp.asarray(pts))
        )
        hit_c = np.asarray(
            query_occupancy(jnp.asarray(coarse.grid), jnp.asarray(coarse.aabb), jnp.asarray(pts))
        )
        assert not (hit_f & ~hit_c).any(), f"voxel {iv}: fine-occupied point coarse-empty"


def _slab_occ(res=32):
    axis = np.linspace(-1.0, 1.0, res)
    zz = np.broadcast_to(axis, (res, res, res))
    grid = ((zz >= 0.2) & (zz <= 0.5)).astype(np.uint8)
    return OccupancyGrid(grid=grid, aabb=np.asarray([[-1.0] * 3, [1.0] * 3], np.float32))


def test_two_stage_bounds_bracket_content():
    occ = _slab_occ()
    spec = OccupancyBoundsSpec(
        grid=occ, coarse=coarsen_occupancy(occ, 4), n_probe=64, n_probe_coarse=32, block=1
    )
    origins = jnp.asarray([[0.0, 0.0, -3.0], [5.0, 5.0, -3.0]])
    dirs = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    t0, t1 = occupancy_bounds(origins, dirs, spec, 0.1, 10.0)
    t0, t1 = np.asarray(t0), np.asarray(t1)
    # slab spans t in [3.2, 3.5]; two-stage bounds must cover it and hug it
    # (coarse voxel + coarse dilation + fine probe spacing of slack)
    assert t0[0] <= 3.2 + 1e-5 and t1[0] >= 3.5 - 1e-5
    assert t0[0] >= 2.0 and t1[0] <= 4.7
    # missing ray collapses to the far plane
    assert t0[1] == pytest.approx(10.0) and t1[1] == pytest.approx(10.0)


def test_image_decimated_bounds_cover_exact_bounds():
    # random blob scene; the block-decimated 3x3-union bounds must CONTAIN
    # the exact per-ray march's occupied span for every full-res ray
    rng = np.random.default_rng(1)
    res = 48
    density = np.zeros((res, res, res), np.float32)
    for _ in range(6):
        c = rng.integers(8, res - 8, size=3)
        density[c[0] - 4 : c[0] + 4, c[1] - 4 : c[1] + 4, c[2] - 4 : c[2] + 4] = 10.0
    occ = build_occupancy_grid(density, (-1.0, 1.0), threshold=5.0, dilate=1)
    spec = OccupancyBoundsSpec(
        grid=occ, coarse=coarsen_occupancy(occ, 4), n_probe=64, n_probe_coarse=24, block=2
    )

    h = w = 21  # odd size exercises the upsample crop
    ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    dirs = np.stack(
        [(jj - w / 2) / (w / 2) * 0.6, (ii - h / 2) / (h / 2) * 0.6, np.ones_like(ii, np.float32)],
        axis=-1,
    ).astype(np.float32)[None]
    origins = np.broadcast_to(np.asarray([0.0, 0.0, -3.0], np.float32), dirs.shape).copy()
    t_lo, t_hi = 0.5, 6.0

    t0_f, t1_f = occupancy_bounds(jnp.asarray(origins), jnp.asarray(dirs), spec, t_lo, t_hi)
    # exact reference: the single-stage fine march per full-res ray
    t0_e, t1_e = occupancy_ray_bounds(
        jnp.asarray(origins), jnp.asarray(dirs), occ, t_lo, t_hi, n_probe=256
    )
    t0_f, t1_f, t0_e, t1_e = map(np.asarray, (t0_f, t1_f, t0_e, t1_e))
    hit = t1_e > t0_e + 1e-6  # rays whose exact march found content
    # decimation slack: one fine probe spacing of the decimated march
    slack = (t_hi - t_lo) / 64 + 1e-4
    assert hit.any()
    assert (t0_f[hit] <= t0_e[hit] + slack).all()
    assert (t1_f[hit] >= t1_e[hit] - slack).all()
    assert t0_f.shape == (1, h, w) and t1_f.shape == (1, h, w)


def test_spec_full_grid_identity_matches_exact():
    occ = OccupancyGrid(
        grid=np.ones((8, 8, 8), np.uint8),
        aabb=np.asarray([[-50.0] * 3, [50.0] * 3], np.float32),
    )
    spec = OccupancyBoundsSpec(grid=occ, coarse=coarsen_occupancy(occ, 4), block=2)
    origins = jnp.zeros((1, 6, 6, 3)) + jnp.asarray([0.0, 0.0, -3.0])
    dirs = jnp.concatenate(
        [jnp.zeros((1, 6, 6, 2)), jnp.ones((1, 6, 6, 1))], axis=-1
    )
    t0, t1 = occupancy_bounds(origins, dirs, spec, 0.5, 7.5)
    np.testing.assert_allclose(np.asarray(t0), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t1), 7.5, atol=1e-6)


def test_sampler_occupancy_tightens_eval_lengths_only(tmp_path):
    # content: a small box around (0, 0, 2.5) — identity cameras look +z
    density = np.zeros((32, 32, 32), np.float32)
    density[14:18, 14:18, 26:29] = 10.0  # z lattice 26..28 -> world z in [2.71, 3.23]
    occ = build_occupancy_grid(density, (-4.0, 4.0), threshold=5.0, dilate=1)
    path = str(tmp_path / "occ.npz")
    save_occupancy(path, occ, threshold=5.0)

    cfg = Config.fromfile(osp.join(CFG_DIR, "ray_samplers/ray_sampler.yml"))
    cfg.ray_sampler.occupancy_grid = path
    cfg.ray_sampler.n_pts_per_ray_evaluation = 16
    cfg.ray_sampler.n_pts_per_ray_training = 16
    sampler = RAY_SAMPLERS.build(cfg.ray_sampler)
    poses, focals = _cams()

    bundle = sampler(None, poses, focals, EvaluationMode.EVALUATION, min_depth=0.1, max_depth=10.0)
    lengths = np.asarray(bundle.lengths)
    # center pixels hit the content; their sample span must hug the content
    # chord [2.71, 3.23] +- one dilated voxel (0.26) + probe spacing
    # ((10-0.1)/64 ~ 0.155) + nearest-voxel rounding (0.13)
    hit = lengths[..., -1] < 9.0  # rays not collapsed to the far plane
    assert hit.any()
    assert lengths[hit].min() >= 2.0 and lengths[hit].max() <= 4.0
    assert np.allclose(lengths[~hit], 10.0)

    # training lengths are untouched (occupancy_eval_only defaults True)
    tb = sampler(jax.random.PRNGKey(0), poses, focals, EvaluationMode.TRAINING,
                 min_depth=0.1, max_depth=10.0)
    tl = np.asarray(tb.lengths)
    assert tl.min() < 1.0 and tl.max() > 9.0  # spans the full chord


def test_sampler_occupancy_full_grid_is_bit_exact_noop(tmp_path):
    # an all-occupied grid must leave eval lengths exactly unchanged
    occ = OccupancyGrid(
        grid=np.ones((8, 8, 8), np.uint8),
        aabb=np.asarray([[-50.0] * 3, [50.0] * 3], np.float32),
    )
    path = str(tmp_path / "occ_full.npz")
    save_occupancy(path, occ, threshold=1.0)

    cfg = Config.fromfile(osp.join(CFG_DIR, "ray_samplers/ray_sampler.yml"))
    base = RAY_SAMPLERS.build(cfg.ray_sampler)
    cfg.ray_sampler.occupancy_grid = path
    with_occ = RAY_SAMPLERS.build(cfg.ray_sampler)
    poses, focals = _cams()
    b0 = base(None, poses, focals, EvaluationMode.EVALUATION)
    b1 = with_occ(None, poses, focals, EvaluationMode.EVALUATION)
    np.testing.assert_array_equal(np.asarray(b0.lengths), np.asarray(b1.lengths))


def test_sampler_occupancy_ndc_validation(tmp_path):
    occ = OccupancyGrid(
        grid=np.ones((4, 4, 4), np.uint8), aabb=np.asarray([[-1.0] * 3, [1.0] * 3], np.float32)
    )
    path = str(tmp_path / "occ.npz")
    save_occupancy(path, occ, threshold=1.0)
    cfg = Config.fromfile(osp.join(CFG_DIR, "ray_samplers/ray_sampler.yml"))
    cfg.ray_sampler.occupancy_grid = path
    cfg.ray_sampler.use_ndc = True
    with pytest.raises(ValueError, match="NDC"):
        RAY_SAMPLERS.build(cfg.ray_sampler)
