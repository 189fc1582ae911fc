"""Iso-surface extraction tests: geometry-verified surface nets + grid eval.

The analytic sphere makes every property checkable exactly: vertex radii,
watertightness (every edge shared by exactly 2 faces), and outward
orientation — stronger-than-reference validation (the reference has no mesh
path at all).
"""

import numpy as np
import pytest

from yanerf_tpu.ops.mesh import evaluate_density_grid, save_obj, surface_nets, triangulate


def _sphere_grid(n=33, r=0.6, lo=-1.0, hi=1.0):
    axis = np.linspace(lo, hi, n)
    x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
    radius = np.sqrt(x * x + y * y + z * z)
    spacing = (hi - lo) / (n - 1)
    return r - radius, (lo, lo, lo), (spacing,) * 3  # iso 0: inside = radius < r


def test_surface_nets_sphere_geometry():
    r = 0.6
    grid, origin, spacing = _sphere_grid(n=33, r=r)
    verts, faces = surface_nets(grid, iso=0.0, origin=origin, spacing=spacing)

    assert len(verts) > 100 and len(faces) > 100
    assert faces.min() >= 0 and faces.max() < len(verts)

    # all vertices on the sphere, within a lattice step
    radii = np.linalg.norm(verts, axis=1)
    assert np.abs(radii - r).max() < spacing[0]

    # watertight: every undirected edge is shared by exactly two quads
    edges = np.concatenate([np.stack([faces[:, i], faces[:, (i + 1) % 4]], 1) for i in range(4)])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()

    # every vertex is used
    assert len(np.unique(faces)) == len(verts)

    # outward orientation: quad normal (0-2 diagonal split) points away
    # from the center for a solid sphere
    a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    normals = np.cross(b - a, c - a)
    centers = (verts[faces[:, 0]] + verts[faces[:, 1]] + verts[faces[:, 2]] + verts[faces[:, 3]]) / 4
    dots = (normals * centers).sum(1)
    assert (dots > 0).all()

    # quad area sums to ~sphere area
    tri = triangulate(faces)
    ta, tb, tc = verts[tri[:, 0]], verts[tri[:, 1]], verts[tri[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(tb - ta, tc - ta), axis=1).sum()
    np.testing.assert_allclose(area, 4 * np.pi * r * r, rtol=0.05)


def test_surface_nets_empty_and_translation():
    grid, origin, spacing = _sphere_grid(n=17, r=0.5)
    # surface entirely absent
    verts, faces = surface_nets(grid, iso=10.0)
    assert verts.shape == (0, 3) and faces.shape == (0, 4)

    # origin/spacing apply affinely
    v1, _ = surface_nets(grid, iso=0.0, origin=origin, spacing=spacing)
    v2, _ = surface_nets(grid, iso=0.0, origin=(5.0, 5.0, 5.0), spacing=(2.0, 2.0, 2.0))
    got = (v1 - np.asarray(origin)) / spacing[0] * 2.0 + 5.0
    np.testing.assert_allclose(got, v2, atol=1e-5)


def test_surface_nets_rejects_bad_grid():
    with pytest.raises(ValueError):
        surface_nets(np.zeros((4, 4)), iso=0.0)
    with pytest.raises(ValueError):
        surface_nets(np.zeros((1, 4, 4)), iso=0.0)


def test_evaluate_density_grid_matches_direct_apply():
    import jax

    from yanerf_tpu.models import MODELS

    model = MODELS.build(
        dict(
            type="NeRFMLP",
            n_layers=2,
            input_skips=[1],
            n_harmonic_functions_xyz=2,
            n_harmonic_functions_dir=1,
            n_hidden_neurons_xyz=16,
            n_hidden_neurons_dir=8,
            latent_dim=0,
            color_dim=3,
        )
    )
    params = model.init(jax.random.PRNGKey(0))
    res = 9
    grid = evaluate_density_grid(model, params, resolution=res, bounds=(-1.0, 1.0), chunk=64)
    assert grid.shape == (res, res, res)
    assert np.isfinite(grid).all()
    assert (grid >= 0).all()  # relu-activated

    # spot-check one lattice point against a direct model call
    axis = np.linspace(-1.0, 1.0, res, dtype=np.float32)
    i, j, k = 2, 5, 7
    pt = np.array([axis[i], axis[j], axis[k]], np.float32)
    out = model.apply(
        params,
        pt.reshape(1, 1, 3),
        np.array([[[0.0, 0.0, 1.0]]], np.float32),
        np.zeros((1, 1, 1), np.float32),
    )
    want = max(float(np.asarray(out["rays_densities"])[0, 0, 0, 0]), 0.0)
    np.testing.assert_allclose(grid[i, j, k], want, rtol=1e-4, atol=1e-5)


def test_save_obj_roundtrip(tmp_path):
    grid, origin, spacing = _sphere_grid(n=17, r=0.5)
    verts, faces = surface_nets(grid, iso=0.0, origin=origin, spacing=spacing)
    path = tmp_path / "sphere.obj"
    save_obj(str(path), verts, faces)
    lines = path.read_text().splitlines()
    v_lines = [ln for ln in lines if ln.startswith("v ")]
    f_lines = [ln for ln in lines if ln.startswith("f ")]
    assert len(v_lines) == len(verts) and len(f_lines) == len(faces)
    got_v0 = np.array([float(t) for t in v_lines[0].split()[1:]])
    np.testing.assert_allclose(got_v0, verts[0], atol=1e-5)
    # 1-indexed faces within range
    idx = np.array([[int(t) for t in ln.split()[1:]] for ln in f_lines])
    assert idx.min() >= 1 and idx.max() <= len(verts)


def test_vertex_normals_sphere_outward():
    from yanerf_tpu.ops.mesh import vertex_normals

    grid, origin, spacing = _sphere_grid(n=33, r=0.6)
    verts, faces = surface_nets(grid, iso=0.0, origin=origin, spacing=spacing)
    vn = vertex_normals(verts, faces)
    np.testing.assert_allclose(np.linalg.norm(vn, axis=1), 1.0, atol=1e-5)
    # outward for a solid sphere: normal aligns with the radial direction
    radial = verts / np.linalg.norm(verts, axis=1, keepdims=True)
    cos = (vn * radial).sum(1)
    assert cos.min() > 0.9

    # degenerate fallback
    lonely = vertex_normals(np.zeros((2, 3), np.float32), np.zeros((0, 4), np.int32))
    np.testing.assert_allclose(lonely, [[0, 0, 1], [0, 0, 1]])


def test_evaluate_vertex_colors_matches_direct_apply(tmp_path):
    import jax

    from yanerf_tpu.models import MODELS
    from yanerf_tpu.ops.mesh import evaluate_vertex_colors, vertex_normals

    model = MODELS.build(
        dict(
            type="NeRFMLP",
            n_layers=2,
            input_skips=[1],
            n_harmonic_functions_xyz=2,
            n_harmonic_functions_dir=1,
            n_hidden_neurons_xyz=16,
            n_hidden_neurons_dir=8,
            latent_dim=0,
            color_dim=3,
        )
    )
    params = model.init(jax.random.PRNGKey(0))
    grid, origin, spacing = _sphere_grid(n=17, r=0.5)
    verts, faces = surface_nets(grid, iso=0.0, origin=origin, spacing=spacing)
    normals = vertex_normals(verts, faces)
    colors = evaluate_vertex_colors(model, params, verts, normals, chunk=64)
    assert colors.shape == (len(verts), 3)
    assert (colors >= 0).all() and (colors <= 1).all()  # sigmoid head

    # spot-check vertex 3 against a direct model call with view = -normal
    out = model.apply(
        params,
        verts[3].reshape(1, 1, 3),
        (-normals[3]).reshape(1, 1, 3),
        np.zeros((1, 1, 1), np.float32),
    )
    want = np.asarray(out["rays_features"])[0, 0, 0, :3]
    np.testing.assert_allclose(colors[3], want, rtol=1e-4, atol=1e-5)

    # colored OBJ: 6-component v lines, clipped to [0, 1]
    path = tmp_path / "colored.obj"
    save_obj(str(path), verts, faces, colors=colors)
    v_lines = [ln for ln in path.read_text().splitlines() if ln.startswith("v ")]
    assert len(v_lines) == len(verts)
    assert all(len(ln.split()) == 7 for ln in v_lines)
    got = np.array([float(t) for t in v_lines[3].split()[1:]])
    np.testing.assert_allclose(got[:3], verts[3], atol=1e-5)
    np.testing.assert_allclose(got[3:], colors[3], atol=1e-3)

    # length mismatch rejected
    with pytest.raises(ValueError):
        save_obj(str(path), verts, faces, colors=colors[:-1])


def test_evaluate_density_grid_mip_model(tmp_path):
    """ADVICE r3: interval-based models (MipNeRFMLP raises on < 2 samples)
    must work through the point-query seam used by extract_mesh/fit_aabb."""
    import jax

    from yanerf_tpu.models import MODELS
    from yanerf_tpu.ops.mesh import evaluate_vertex_colors

    model = MODELS.build(
        dict(
            type="MipNeRFMLP",
            base_radius=5.196e-4,
            n_layers=2,
            input_skips=[1],
            n_harmonic_functions_xyz=2,
            n_harmonic_functions_dir=1,
            n_hidden_neurons_xyz=16,
            n_hidden_neurons_dir=8,
            latent_dim=0,
            color_dim=3,
        )
    )
    params = model.init(jax.random.PRNGKey(0))
    res = 5
    grid = evaluate_density_grid(model, params, resolution=res, bounds=(-1.0, 1.0), chunk=32)
    assert grid.shape == (res, res, res)
    assert np.isfinite(grid).all()

    # the vanishing-footprint probe must agree with a direct 2-sample apply
    # whose first interval is centred at the lattice point
    axis = np.linspace(-1.0, 1.0, res, dtype=np.float32)
    i, j, k = 1, 2, 3
    pt = np.array([axis[i], axis[j], axis[k]], np.float32)
    out = model.apply(
        params,
        pt.reshape(1, 1, 3),
        np.array([[[0.0, 0.0, 1.0]]], np.float32),
        np.array([[[0.0, 1e-3]]], np.float32),
    )
    want = max(float(np.asarray(out["rays_densities"])[0, 0, 0, 0]), 0.0)
    np.testing.assert_allclose(grid[i, j, k], want, rtol=1e-4, atol=1e-5)

    verts = np.array([[0.1, 0.2, 0.3]], np.float32)
    normals = np.array([[0.0, 0.0, 1.0]], np.float32)
    colors = evaluate_vertex_colors(model, params, verts, normals)
    assert colors.shape == (1, 3)
    assert np.isfinite(colors).all()
