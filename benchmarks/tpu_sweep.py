"""One-shot TPU measurement worker (run detached; writes _tpu_results.log).

Round 3: bf16-cotangent training policy, remat on/off, pallas tile sweep,
eval render fps.
"""

import time

import numpy as np


def log(msg):
    print(msg, flush=True)


def time_train(pipeline, label, n=60):
    import jax
    from __graft_entry__ import _example_batch
    from yanerf_tpu.runners import create_optimizer, create_train_state, make_train_step, prepare_batch
    from yanerf_tpu.utils.config import ConfigDict
    from typing import NamedTuple

    class W(NamedTuple):
        poses: object
        focal_lengths: object
        image_rgb: object

    cfg = ConfigDict(dict(init_lr=5e-4, min_lr=5e-5, weight_decay=0.0, warmup_steps=1000, warmup_lr=1e-5,
                          lr_decay_type="exponential", lr_decay_rate=0.1, lr_decay_iters=250000, num_iters=200000))
    opt = create_optimizer(cfg)
    params = pipeline.init(jax.random.PRNGKey(0))
    state = create_train_state(params, opt)
    batch = prepare_batch(_example_batch(1, 800), W, None)
    step = make_train_step(pipeline, opt, donate=True)
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
    log(f"{label}: {dt/n*1000:.2f} ms/step -> {4096*n/dt:.0f} rays/s (obj {val:.4f})")


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch, _flagship_pipeline
    from yanerf_tpu.ops.structures import EvaluationMode

    t0 = time.time()
    x = jnp.ones((8, 8))
    log(f"claimed device after {time.time()-t0:.1f}s: {float(np.asarray(x.sum()))}")

    # ---- 1. train step: bf16 cotangents, remat off/on
    p = _flagship_pipeline(n_rays=4096, image_hw=800, compute_dtype="bfloat16")
    time_train(p, "TRAIN bf16-cotangent remat=off")
    p.remat_models = True
    time_train(p, "TRAIN bf16-cotangent remat=on")
    p.remat_models = False

    # ---- 2. pallas tile sweep on 1.05M pts
    from yanerf_tpu.ops.pallas import nerf_mlp_forward_pallas
    from yanerf_tpu.ops.rays import ray_bundle_to_ray_points

    params = p.init(jax.random.PRNGKey(0))
    model = p.implicit_functions[0]
    mp = params["implicit_functions"][0]
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
    for tile in (1024, 2048, 8192, 16384):
        def pallas_body(i, c, _tile=tile):
            dens, cols = nerf_mlp_forward_pallas(model, mp, pts + c * 0, d, tile=_tile)
            return c + jnp.mean(dens)
        try:
            chain(f"MLP fwd PALLAS tile={tile}", pallas_body)
        except Exception as e:
            log(f"PALLAS tile={tile} FAILED: {type(e).__name__}: {e}")

    # ---- 3. eval render 800x800
    for use_pallas in (False, True):
        for chunk in (131072, 1048576, 4194304):
            try:
                p.chunk_size_grid = chunk
                for fn in p.implicit_functions:
                    fn.use_pallas = use_pallas

                @jax.jit
                def render(params, rng, poses, focals):
                    preds = p.forward(params, rng, poses=poses, focal_lengths=focals,
                                      evaluation_mode=EvaluationMode.EVALUATION)
                    return preds["rendered_images"]

                poses_np, focals_np, _ = _example_batch(1, 800)
                rng = jax.random.PRNGKey(1)
                t0 = time.time()
                frame = render(params, rng, jnp.asarray(poses_np), jnp.asarray(focals_np))
                np.asarray(frame)
                compile_t = time.time() - t0
                t0 = time.time()
                n_frames = 3
                for i in range(n_frames):
                    frame = render(params, jax.random.fold_in(rng, i), jnp.asarray(poses_np), jnp.asarray(focals_np))
                np.asarray(frame)
                dt = time.time() - t0
                log(f"RENDER 800px pallas={use_pallas} chunk={chunk}: {dt/n_frames:.3f}s/frame = {n_frames/dt:.3f} fps (compile {compile_t:.1f}s)")
            except Exception as e:
                log(f"RENDER pallas={use_pallas} chunk={chunk} FAILED: {type(e).__name__}: {e}")

    log("WORKER DONE")


if __name__ == "__main__":
    main()
