import time, numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _example_batch, _flagship_pipeline
from yanerf_tpu.runners import create_optimizer, create_train_state, make_train_step, prepare_batch
from yanerf_tpu.utils.config import ConfigDict
from typing import NamedTuple
class W(NamedTuple):
    poses: object; focal_lengths: object; image_rgb: object
print("init...", flush=True)
t0 = time.perf_counter()
x = jax.numpy.ones((8,8)); print("device warm:", float(np.asarray(x.sum())), time.perf_counter()-t0, flush=True)
pipeline = _flagship_pipeline(n_rays=4096, image_hw=800, compute_dtype="bfloat16")
cfg = ConfigDict(dict(init_lr=5e-4, min_lr=5e-5, weight_decay=0.0, warmup_steps=1000, warmup_lr=1e-5,
    lr_decay_type="exponential", lr_decay_rate=0.1, lr_decay_iters=250000, num_iters=200000))
opt = create_optimizer(cfg)
params = pipeline.init(jax.random.PRNGKey(0))
state = create_train_state(params, opt)
batch = prepare_batch(_example_batch(1, 800), W, None)
step = make_train_step(pipeline, opt, donate=True)
rng = jax.random.PRNGKey(1)
t0 = time.perf_counter()
state, preds = step(state, batch, rng)
print("dispatch+compile:", time.perf_counter()-t0, flush=True)
t0 = time.perf_counter()
print("first objective:", np.asarray(preds["objective"]), time.perf_counter()-t0, flush=True)
for n in (20, 100):
    t0 = time.perf_counter()
    for _ in range(n):
        state, preds = step(state, batch, rng)
    val = float(np.asarray(preds["objective"])[0])
    dt = time.perf_counter() - t0
    print(f"{n} steps: {dt:.3f}s = {dt/n*1000:.2f} ms/step -> {4096*n/dt:.0f} rays/s (obj {val:.4f})", flush=True)
