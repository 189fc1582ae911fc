"""HashGridNeRF (Instant-NGP-style) model family tests."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from yanerf_tpu.models import MODELS, HashGridNeRF


def _small_model(**kw):
    cfg = dict(
        type="HashGridNeRF",
        n_levels=4,
        table_size_log2=10,
        n_features_per_level=2,
        base_resolution=4,
        max_resolution=32,
        hidden_dim=16,
        geo_feature_dim=7,
        n_color_layers=1,
        n_harmonic_functions_dir=2,
        scene_bound=1.0,
    )
    cfg.update(kw)
    return MODELS.build(cfg)


def test_registry_and_output_contract():
    model = _small_model()
    params = model.init(jax.random.PRNGKey(0))
    origins = jnp.zeros((2, 5, 1, 3))
    directions = jnp.ones((2, 5, 1, 3))
    lengths = jnp.broadcast_to(jnp.linspace(0.1, 1.0, 6), (2, 5, 1, 6))
    out = model.apply(params, origins, directions, lengths)
    assert out["rays_densities"].shape == (2, 5, 1, 6, 1)
    assert out["rays_features"].shape == (2, 5, 1, 6, 3)
    assert np.isfinite(np.asarray(out["rays_densities"])).all()
    colors = np.asarray(out["rays_features"])
    assert (colors >= 0).all() and (colors <= 1).all()  # sigmoid head


def test_dense_and_hashed_levels():
    model = _small_model()
    # coarse level 0 (res 4): dense 5^3 table; finest level must be hashed
    assert model.level_table_sizes[0] == 5**3
    assert model.level_table_sizes[-1] == 1 << 10
    params = model.init(jax.random.PRNGKey(0))
    assert params["tables"][0].shape == (125, 2)
    assert params["tables"][-1].shape == (1024, 2)


def test_trilinear_interpolation_exact_on_linear_field():
    """With table entries set to a linear function of the dense-grid corner
    position, trilinear interpolation must reproduce the function exactly."""
    model = _small_model(n_levels=1, base_resolution=4, max_resolution=4, scene_bound=1.0)
    res = model.resolutions[0]
    stride = res + 1
    coords = np.stack(np.meshgrid(*[np.arange(stride)] * 3, indexing="ij"), axis=-1).reshape(-1, 3)
    # f(corner) = 2*x + 3*y - z in grid units, in both feature channels
    values = (2 * coords[:, 0] + 3 * coords[:, 1] - coords[:, 2]).astype(np.float32)
    tables = [jnp.asarray(np.stack([values, values], axis=-1))]

    pts01 = np.random.RandomState(0).uniform(0.05, 0.95, size=(50, 3)).astype(np.float32)
    world = pts01 * 2.0 - 1.0  # invert the [0,1] normalization at bound=1
    enc = np.asarray(model.encode(tables, jnp.asarray(world)))
    scaled = pts01 * res
    expected = 2 * scaled[:, 0] + 3 * scaled[:, 1] - scaled[:, 2]
    np.testing.assert_allclose(enc[:, 0], expected, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(enc[:, 1], expected, rtol=1e-4, atol=1e-3)


def test_encoding_gradients_flow_to_tables():
    model = _small_model()
    params = model.init(jax.random.PRNGKey(0))
    pts = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-0.9, maxval=0.9)

    def loss(tables):
        return jnp.sum(model.encode(tables, pts) ** 2)

    grads = jax.grad(loss)(params["tables"])
    # at least the dense coarse level must receive nonzero gradient
    assert float(jnp.abs(grads[0]).sum()) > 0


def test_overfit_tiny_field():
    """The full model must overfit a handful of (point, density) targets —
    the analog of the runner convergence test, model-only."""
    import optax

    model = _small_model()
    params = model.init(jax.random.PRNGKey(0))
    origins = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 1, 3), minval=-0.5, maxval=0.5)
    directions = jnp.ones((1, 16, 1, 3))
    lengths = jnp.zeros((1, 16, 1, 1))
    target = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 1, 1, 3))

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply(p, origins, directions, lengths)
            return jnp.mean((out["rays_features"] - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    loss0 = None
    for i in range(200):
        params, opt_state, loss = step(params, opt_state)
        if loss0 is None:
            loss0 = float(loss)
    assert float(loss) < 0.1 * loss0, (loss0, float(loss))


@pytest.mark.slow
def test_pipeline_composition_with_hash_grid():
    """HashGridNeRF drops into the standard pipeline via the registry."""
    from yanerf_tpu.ops.structures import EvaluationMode
    from yanerf_tpu.pipelines import PIPELINES

    pipeline = PIPELINES.build(
        dict(
            type="NeRFPipeline",
            chunk_size_grid=256,
            num_passes=2,
            output_rasterized_mc=False,
            loss_weights={"loss_rgb_mse": 1.0, "loss_prev_stage_rgb_mse": 1.0},
            model=dict(
                type="HashGridNeRF",
                n_levels=4,
                table_size_log2=10,
                base_resolution=4,
                max_resolution=32,
                hidden_dim=16,
                geo_feature_dim=7,
                n_color_layers=1,
                n_harmonic_functions_dir=2,
                scene_bound=4.0,
            ),
            ray_sampler=dict(
                type="RaySampler",
                image_height=6,
                image_width=6,
                min_depth=1.0,
                max_depth=3.0,
                n_pts_per_ray_training=4,
                n_pts_per_ray_evaluation=4,
                n_rays_per_image_sampled_from_mask=8,
            ),
            renderer=dict(
                type="MultipassEmissionAbsorpsionRenderer",
                n_pts_per_ray_fine_training=4,
                n_pts_per_ray_fine_evaluation=4,
                bg_color=[0.0, 0.0, 0.0],
                density_noise_std_train=0.0,
            ),
            feature_extractor=[],
        )
    )
    params = pipeline.init(jax.random.PRNGKey(0))
    poses = jnp.eye(4)[None]
    poses = poses.at[0, 2, 3].set(2.0)
    focals = jnp.asarray([[6.0]])
    image = jax.random.uniform(jax.random.PRNGKey(1), (1, 6, 6, 3))

    for mode in (EvaluationMode.TRAINING, EvaluationMode.EVALUATION):
        preds = pipeline.forward(
            params,
            jax.random.PRNGKey(2),
            poses=poses,
            focal_lengths=focals,
            image_rgb=image,
            evaluation_mode=mode,
        )
        assert np.isfinite(float(jnp.mean(preds["objective"])))


def test_table_lookup_custom_vjp_matches_autodiff():
    """The flat-scatter backward (TPU-tuned) must equal plain-gather autodiff."""
    from yanerf_tpu.models.hash_grid import table_lookup

    key = jax.random.PRNGKey(7)
    table = jax.random.normal(key, (64, 2))
    idx = jax.random.randint(jax.random.fold_in(key, 1), (300,), 0, 64)
    ct_seed = jax.random.normal(jax.random.fold_in(key, 2), (300, 2))

    def loss_custom(t):
        return jnp.sum(table_lookup(t, idx) * ct_seed)

    def loss_plain(t):
        return jnp.sum(jnp.take(t, idx, axis=0) * ct_seed)

    np.testing.assert_allclose(loss_custom(table), loss_plain(table), rtol=1e-6)
    g_custom = jax.grad(loss_custom)(table)
    g_plain = jax.grad(loss_plain)(table)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_plain), rtol=1e-5, atol=1e-6)


def test_encode_grad_matches_plain_gather_formulation():
    """Full encode gradients are unchanged by the custom-VJP lookup."""
    m = _small_model()
    params = m.init(jax.random.PRNGKey(0))
    pts = jax.random.uniform(jax.random.PRNGKey(1), (50, 3), minval=-3.0, maxval=3.0)
    ct = jax.random.normal(jax.random.PRNGKey(2), (50, m.encoding_dim))

    def loss(tables):
        return jnp.sum(m.encode(tables, pts) * ct)

    grads = jax.grad(loss)(params["tables"])
    # finite-difference spot check on a handful of touched rows
    t0 = params["tables"][0]
    probe = np.unravel_index(int(jnp.argmax(jnp.abs(grads[0]))), t0.shape)
    eps = 1e-3
    tp = [t for t in params["tables"]]
    tp[0] = t0.at[probe].add(eps)
    lp = loss(tp)
    tp[0] = t0.at[probe].add(-eps)
    lm = loss(tp)
    fd = (lp - lm) / (2 * eps)
    np.testing.assert_allclose(float(grads[0][probe]), float(fd), rtol=2e-2)


def test_encode_chunked_matches_unchunked():
    """The lax.map-chunked encode (fixed scatter shapes for the remote
    compiler; docs/performance.md) is bit-equivalent to the one-shot path,
    forward and backward, including the padded final chunk."""
    m_chunked = _small_model(encode_chunk=64)
    m_plain = _small_model(encode_chunk=0)
    params = m_plain.init(jax.random.PRNGKey(0))
    # 150 points -> 3 chunks of 64 with 42 rows of padding
    pts = jax.random.uniform(jax.random.PRNGKey(1), (150, 3), minval=-2.0, maxval=2.0)
    ct = jax.random.normal(jax.random.PRNGKey(2), (150, m_plain.encoding_dim))

    e_chunked = m_chunked.encode(params["tables"], pts)
    e_plain = m_plain.encode(params["tables"], pts)
    np.testing.assert_allclose(np.asarray(e_chunked), np.asarray(e_plain), atol=1e-7)

    def loss(m):
        return lambda tables: jnp.sum(m.encode(tables, pts) * ct)

    g_chunked = jax.grad(loss(m_chunked))(params["tables"])
    g_plain = jax.grad(loss(m_plain))(params["tables"])
    for gc, gp in zip(g_chunked, g_plain):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gp), rtol=1e-5, atol=1e-6)


def test_table_lookup_bwd_scan_path_matches_flat(monkeypatch):
    """The compile-safe lax.scan backward (used above the update-count
    threshold so flagship shapes compile through the remote XLA helper)
    must produce bit-identical gradients to the one-shot flat scatters."""
    import jax
    import jax.numpy as jnp

    from yanerf_tpu.models import hash_grid as hg

    rng = np.random.RandomState(0)
    n_rows, n_feats, n_updates = 64, 2, 5000  # not a multiple of the chunk
    table = jnp.asarray(rng.randn(n_rows, n_feats).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n_rows, size=(n_updates,)), jnp.int32)
    ct_seed = jnp.asarray(rng.randn(n_updates, n_feats).astype(np.float32))

    def loss(t):
        return jnp.sum(hg.table_lookup(t, idx) * ct_seed)

    monkeypatch.setattr(hg, "_BWD_SCAN_THRESHOLD", 1 << 30)
    monkeypatch.setattr(hg, "_BWD_SCAN_CHUNK", 1 << 30)
    flat_grad = jax.grad(loss)(table)

    monkeypatch.setattr(hg, "_BWD_SCAN_THRESHOLD", 0)
    monkeypatch.setattr(hg, "_BWD_SCAN_CHUNK", 512)
    scan_grad = jax.grad(loss)(table)

    np.testing.assert_array_equal(np.asarray(scan_grad), np.asarray(flat_grad))

    # and both match plain autodiff of the underlying take
    auto_grad = jax.grad(lambda t: jnp.sum(jnp.take(t, idx, axis=0) * ct_seed))(table)
    np.testing.assert_allclose(np.asarray(flat_grad), np.asarray(auto_grad), rtol=1e-6, atol=1e-6)


def test_table_lookup_bwd_sort_path_matches_flat(monkeypatch):
    """The round-5 scatter-free sort backward (YANERF_HASHGRID_BWD=sort)
    must match the one-shot flat-scatter gradient. Exercises: rows with
    many collisions, rows never referenced, run boundaries at both array
    ends, and a non-power-of-two update count."""
    import jax
    import jax.numpy as jnp

    from yanerf_tpu.models import hash_grid as hg

    rng = np.random.RandomState(1)
    n_rows, n_feats, n_updates = 97, 2, 4999
    table = jnp.asarray(rng.randn(n_rows, n_feats).astype(np.float32))
    # skewed index distribution: heavy collisions on a few rows, plus the
    # exact first/last rows, plus rows that never appear
    idx_np = rng.randint(0, 80, size=(n_updates,))  # rows 80..95 never referenced
    idx_np[: n_updates // 3] = rng.choice([0, 1, 50, n_rows - 1], size=n_updates // 3)
    idx = jnp.asarray(idx_np, jnp.int32)
    ct_seed = jnp.asarray(rng.randn(n_updates, n_feats).astype(np.float32))

    def loss(t):
        return jnp.sum(hg.table_lookup(t, idx) * ct_seed)

    monkeypatch.setattr(hg, "_BWD_MODE", "scatter")
    flat_grad = jax.grad(loss)(table)
    monkeypatch.setattr(hg, "_BWD_MODE", "sort")
    sort_grad = jax.grad(loss)(table)
    # tree-order vs scatter-order f32 summation: tiny rounding differences
    np.testing.assert_allclose(np.asarray(sort_grad), np.asarray(flat_grad), rtol=1e-5, atol=1e-5)
    # rows never referenced must be exactly zero
    untouched = np.setdiff1d(np.arange(n_rows), np.unique(idx_np))
    assert untouched.size > 0
    assert (np.asarray(sort_grad)[untouched] == 0.0).all()


def test_table_lookup_bwd_sort_whole_model_grads(monkeypatch):
    """End-to-end encode gradients under the sort backward match autodiff."""
    import jax
    import jax.numpy as jnp

    from yanerf_tpu.models import hash_grid as hg

    m = _small_model(encode_chunk=64)
    params = m.init(jax.random.PRNGKey(0))
    pts = jax.random.uniform(jax.random.PRNGKey(1), (150, 3), minval=-2.0, maxval=2.0)
    ct = jax.random.normal(jax.random.PRNGKey(2), (150, m.encoding_dim))

    def loss(tables):
        return jnp.sum(m.encode(tables, pts) * ct)

    monkeypatch.setattr(hg, "_BWD_MODE", "sort")
    g_sort = jax.grad(loss)(params["tables"])
    monkeypatch.setattr(hg, "_BWD_MODE", "auto")
    g_auto = jax.grad(loss)(params["tables"])
    for gs, ga in zip(g_sort, g_auto):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(ga), rtol=1e-5, atol=1e-6)


def test_contract_coords_requires_covering_scene_bound():
    from yanerf_tpu.models import MODELS

    with pytest.raises(ValueError, match="scene_bound >= 2.0"):
        MODELS.build(dict(type="HashGridNeRF", contract_coords=True, scene_bound=1.5))
    m = MODELS.build(dict(type="HashGridNeRF", contract_coords=True, scene_bound=2.0))
    assert m.scene_bound == 2.0
