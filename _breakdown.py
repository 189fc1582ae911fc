import time
from typing import NamedTuple
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from __graft_entry__ import _example_batch, _flagship_pipeline
    from yanerf_tpu.runners import create_optimizer, create_train_state, make_train_step, prepare_batch
    from yanerf_tpu.utils.config import ConfigDict

    class W(NamedTuple):
        poses: object; focal_lengths: object; image_rgb: object

    x = jnp.ones((8, 8)); float(np.asarray(x.sum()))
    print("claimed", flush=True)

    cfg = ConfigDict(dict(init_lr=5e-4, min_lr=5e-5, weight_decay=0.0, warmup_steps=1000, warmup_lr=1e-5,
                          lr_decay_type="exponential", lr_decay_rate=0.1, lr_decay_iters=250000, num_iters=200000))

    for fused in (False, True):
        p = _flagship_pipeline(n_rays=4096, image_hw=800, compute_dtype="bfloat16")
        for fn in p.implicit_functions:
            fn.use_pallas_train = fused
            fn.use_pallas = fused
        opt = create_optimizer(cfg)
        state = create_train_state(p.init(jax.random.PRNGKey(0)), opt)
        batch = prepare_batch(_example_batch(1, 800), W, None)
        step = make_train_step(p, opt, donate=True)
        rng = jax.random.PRNGKey(1)
        try:
            t0 = time.time()
            state, preds = step(state, batch, rng)
            o0 = float(np.asarray(preds["objective"])[0])
            print(f"fused={fused}: compile {time.time()-t0:.1f}s obj {o0:.4f}", flush=True)
            for _ in range(5): state, preds = step(state, batch, rng)
            float(np.asarray(preds["objective"])[0])
            t0 = time.time(); n = 60
            for _ in range(n): state, preds = step(state, batch, rng)
            v = float(np.asarray(preds["objective"])[0])
            dt = time.time()-t0
            print(f"TRAIN fused={fused}: {dt/n*1000:.2f} ms/step -> {4096*n/dt:.0f} rays/s (obj {v:.4f})", flush=True)
        except Exception as e:
            print(f"fused={fused} FAILED: {type(e).__name__}: {str(e)[:600]}", flush=True)
    print("DONE", flush=True)

main()
