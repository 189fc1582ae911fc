"""Round-2 TPU measurement worker (run detached; prints to stdout).

Covers VERDICT items 3 + 4:
  1. fused-forward tile sweep vs the XLA forward (lane-aligned kernels),
  2. fused TRAIN step (use_pallas_train) vs the XLA train step,
  3. GSPMD ray-sharded eval on a 1-chip mesh vs the unsharded program
     (proves the sharded program's MFU before multi-chip projection),
  4. eval render fps at the winning settings.

Run:  nohup python -u benchmarks/r2_kernel_bench.py > /tmp/r2_kernel.log 2>&1 &
Never kill it mid-run (stale TPU lease).
"""

import os
import sys
import time
from typing import NamedTuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, flush=True)


class W(NamedTuple):
    poses: object
    focal_lengths: object
    image_rgb: object


def time_train(pipeline, label, mesh=None, n=60, n_rays=4096):
    import jax

    from __graft_entry__ import _example_batch
    from yanerf_tpu.runners import create_optimizer, create_train_state, make_train_step, prepare_batch
    from yanerf_tpu.utils.config import ConfigDict

    cfg = ConfigDict(dict(init_lr=5e-4, min_lr=5e-5, weight_decay=0.0, warmup_steps=1000, warmup_lr=1e-5,
                          lr_decay_type="exponential", lr_decay_rate=0.1, lr_decay_iters=250000, num_iters=200000))
    opt = create_optimizer(cfg)
    params = pipeline.init(jax.random.PRNGKey(0))
    state = create_train_state(params, opt)
    batch = prepare_batch(_example_batch(1, 800), W, mesh)
    step = make_train_step(pipeline, opt, mesh=mesh, donate=True)
    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    state, preds = step(state, batch, rng)
    obj0 = float(np.asarray(preds["objective"])[0])
    log(f"{label}: compile+first {time.time()-t0:.1f}s (obj {obj0:.4f})")
    for _ in range(5):
        state, preds = step(state, batch, rng)
    float(np.asarray(preds["objective"])[0])
    t0 = time.time()
    for _ in range(n):
        state, preds = step(state, batch, rng)
    val = float(np.asarray(preds["objective"])[0])
    dt = time.time() - t0
    log(f"{label}: {dt/n*1000:.2f} ms/step -> {n_rays*n/dt:.0f} rays/s (obj {val:.4f})")
    return dt / n


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch, _flagship_pipeline
    from yanerf_tpu.ops.structures import EvaluationMode
    from yanerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    t0 = time.time()
    x = jnp.ones((8, 8))
    log(f"claimed device after {time.time()-t0:.1f}s: {float(np.asarray(x.sum()))}")

    p = _flagship_pipeline(n_rays=4096, image_hw=800, compute_dtype="bfloat16")
    params = p.init(jax.random.PRNGKey(0))
    model = p.implicit_functions[0]
    mp = params["implicit_functions"][0]

    # ---- 1. forward: XLA vs lane-aligned Pallas tiles on 1.05M pts --------
    from yanerf_tpu.ops.pallas import nerf_mlp_forward_pallas
    from yanerf_tpu.ops.rays import ray_bundle_to_ray_points

    k = jax.random.PRNGKey(2)
    o = jax.random.normal(k, (1, 4096, 1, 3))
    d = jax.random.normal(jax.random.fold_in(k, 1), (1, 4096, 1, 3))
    l = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 256), (1, 4096, 1, 256))
    pts = ray_bundle_to_ray_points(o, d, l)

    def chain(name, body, n=30):
        f = jax.jit(lambda c: jax.lax.fori_loop(0, n, body, c))
        v = float(np.asarray(f(jnp.float32(0))))
        t0 = time.time()
        v = float(np.asarray(f(jnp.float32(0))))
        log(f"{name}: {(time.time()-t0)/n*1000:.2f} ms (val {v:.4f})")

    def xla_body(i, c):
        out = model.apply(mp, o + c * 0, d, l, use_pallas=False)
        return c + jnp.mean(out["rays_densities"])

    chain("MLP fwd XLA", xla_body)
    for tile in (2048, 4096, 8192, 16384, 32768):
        def pallas_body(i, c, _tile=tile):
            dens, cols = nerf_mlp_forward_pallas(model, mp, pts + c * 0, d, tile=_tile)
            return c + jnp.mean(dens)
        try:
            chain(f"MLP fwd PALLAS tile={tile}", pallas_body)
        except Exception as e:
            log(f"PALLAS tile={tile} FAILED: {type(e).__name__}: {str(e)[:300]}")

    # ---- 1b. fused backward tile sweep (fwd+bwd through custom VJP) -------
    from yanerf_tpu.ops.pallas import make_fused_mlp
    import yanerf_tpu.ops.pallas.nerf_mlp_bwd as bwd_mod

    for tile in (1024, 2048, 4096, 8192):
        bwd_mod.BWD_TILE = tile
        make_fused_mlp.cache_clear()
        fused = make_fused_mlp(model)

        def grad_body(i, c, _fused=fused):
            def loss(mp_):
                dens, cols = _fused(mp_, pts + c * 0, d)
                return jnp.mean(dens) + jnp.mean(cols)
            g = jax.grad(loss)(mp)
            return c + jnp.mean(g["density_layer"]["w"])
        try:
            chain(f"MLP fwd+bwd PALLAS bwd_tile={tile}", grad_body, n=15)
        except Exception as e:
            log(f"PALLAS bwd_tile={tile} FAILED: {type(e).__name__}: {str(e)[:300]}")
    bwd_mod.BWD_TILE = 1024
    make_fused_mlp.cache_clear()

    def xla_grad_body(i, c):
        def loss(mp_):
            out = model.apply(mp_, o + c * 0, d, l, use_pallas=False)
            return jnp.mean(out["rays_densities"]) + jnp.mean(out["rays_features"])
        g = jax.grad(loss)(mp)
        return c + jnp.mean(g["density_layer"]["w"])

    chain("MLP fwd+bwd XLA", xla_grad_body, n=15)

    # ---- 2. full train step: XLA vs fused ----------------------------------
    xla_ms = time_train(p, "TRAIN XLA (r1 baseline config)")
    for fn in p.implicit_functions:
        fn.use_pallas_train = True
        fn.use_pallas = True
    fused_ms = time_train(p, "TRAIN fused-pallas")
    for fn in p.implicit_functions:
        fn.use_pallas_train = False
        fn.use_pallas = False
    log(f"SUMMARY train: xla={xla_ms*1000:.2f}ms fused={fused_ms*1000:.2f}ms")

    # ---- 3. sharded vs unsharded eval program on a 1-chip mesh -------------
    from yanerf_tpu.parallel import create_mesh
    from yanerf_tpu.parallel.sharding import mesh_context

    poses_np, focals_np, _ = _example_batch(1, 800)
    p.chunk_size_grid = 1048576

    def render_fn(params, rng, poses, focals):
        preds = p.forward(params, rng, poses=poses, focal_lengths=focals,
                          evaluation_mode=EvaluationMode.EVALUATION)
        return preds["rendered_images"]

    for label, mesh in (("unsharded", None), ("gspmd-1chip-mesh", create_mesh(jax.devices()[:1], 1, 1))):
        try:
            render = jax.jit(render_fn)
            rng = jax.random.PRNGKey(1)
            with mesh_context(mesh):
                t0 = time.time()
                frame = render(params, rng, jnp.asarray(poses_np), jnp.asarray(focals_np))
                np.asarray(frame)
                compile_t = time.time() - t0
                t0 = time.time()
                n_frames = 4
                for i in range(n_frames):
                    frame = render(params, jax.random.fold_in(rng, i), jnp.asarray(poses_np), jnp.asarray(focals_np))
                np.asarray(frame)
                dt = time.time() - t0
            log(f"RENDER 800px {label}: {dt/n_frames:.3f}s/frame = {n_frames/dt:.3f} fps (compile {compile_t:.1f}s)")
        except Exception as e:
            log(f"RENDER {label} FAILED: {type(e).__name__}: {str(e)[:300]}")

    # eval with pallas forward at best chunk
    for fn in p.implicit_functions:
        fn.use_pallas = True
    try:
        render = jax.jit(render_fn)
        rng = jax.random.PRNGKey(1)
        t0 = time.time()
        frame = render(params, rng, jnp.asarray(poses_np), jnp.asarray(focals_np))
        np.asarray(frame)
        compile_t = time.time() - t0
        t0 = time.time()
        n_frames = 4
        for i in range(n_frames):
            frame = render(params, jax.random.fold_in(rng, i), jnp.asarray(poses_np), jnp.asarray(focals_np))
        np.asarray(frame)
        dt = time.time() - t0
        log(f"RENDER 800px pallas-fwd: {dt/n_frames:.3f}s/frame = {n_frames/dt:.3f} fps (compile {compile_t:.1f}s)")
    except Exception as e:
        log(f"RENDER pallas-fwd FAILED: {type(e).__name__}: {str(e)[:300]}")

    log("WORKER DONE")


if __name__ == "__main__":
    main()
