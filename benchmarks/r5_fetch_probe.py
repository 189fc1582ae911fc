"""Probe the host<->device value-fetch cost through the axon tunnel.

Hypothesis for the eval-fps noise/ceiling (r5 bisect arms measured the
16-16-8 frontier anywhere from 2.4 to 4.1 fps with identical code): the
pipelined eval loop fetches one 800x800x3 f32 frame (7.3 MB) per frame,
and the tunnel's transfer bandwidth/latency — not device compute — sets
the frame rate once the point budget is small. If true, delivering uint8
frames (1.8 MB, what PNG writing and serving consume anyway) should
recover most of it.

Measures: (a) raw fetch time of resident f32/uint8/bf16 frames, (b) the
16-16-8 frontier fps with f32 vs device-side uint8 delivery, (c) uint8
with TWO frames in flight.

Run: nohup python -u benchmarks/r5_fetch_probe.py > /tmp/r5_fetch.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.r5_regression_bisect import build_proposal
    from __graft_entry__ import _example_batch
    from yanerf_tpu.ops.structures import EvaluationMode
    from yanerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"device: {jax.devices()[0].platform}")
    out = {}

    # (a) raw fetch cost of a resident frame
    for name, dtype in (("f32", jnp.float32), ("uint8", jnp.uint8), ("bf16", jnp.bfloat16)):
        x = jax.device_put(jnp.zeros((800, 800, 3), dtype))
        np.asarray(x)  # warm
        reps = 12
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(x)
        dt = (time.perf_counter() - t0) / reps
        out[f"fetch_ms_{name}"] = round(dt * 1e3, 2)
        log(f"fetch {name} (800x800x3): {dt*1e3:.1f} ms -> {2.4e6*np.dtype(np.float32 if name=='f32' else np.uint8).itemsize/dt/1e6 if name!='bf16' else 0:.0f} MB/s-ish")

    # (b) frontier fps: f32 delivery vs device-side uint8 delivery
    poses_np, focals_np, _ = _example_batch(1, 800)
    poses, focals = jnp.asarray(poses_np), jnp.asarray(focals_np)
    pipeline = build_proposal(chunk=4194304, eval_budget=(16, 16, 8))
    params = pipeline.init(jax.random.PRNGKey(0))

    def render_f32(params, rng, poses, focals):
        return pipeline.forward(params, rng, poses=poses, focal_lengths=focals,
                                evaluation_mode=EvaluationMode.EVALUATION)["rendered_images"]

    def render_u8(params, rng, poses, focals):
        img = render_f32(params, rng, poses, focals)
        return jnp.clip(img * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)

    rng = jax.random.PRNGKey(1)

    def fps(render, n_frames=10, depth=1, passes=3):
        render = jax.jit(render)
        np.asarray(render(params, rng, poses, focals))
        best = 0.0
        for _ in range(passes):
            start = time.perf_counter()
            pending = []
            for i in range(n_frames):
                pending.append(render(params, jax.random.fold_in(rng, i), poses, focals))
                if len(pending) > depth:
                    np.asarray(pending.pop(0))
            for p in pending:
                np.asarray(p)
            best = max(best, n_frames / (time.perf_counter() - start))
        return best

    out["fps_16_16_8_f32"] = round(fps(render_f32), 3)
    log(f"16-16-8 f32 delivery: {out['fps_16_16_8_f32']} fps")
    out["fps_16_16_8_u8"] = round(fps(render_u8), 3)
    log(f"16-16-8 uint8 delivery: {out['fps_16_16_8_u8']} fps")
    out["fps_16_16_8_u8_depth2"] = round(fps(render_u8, depth=2), 3)
    log(f"16-16-8 uint8 depth-2: {out['fps_16_16_8_u8_depth2']} fps")

    # (c) the 39.5-PSNR-class budgets with uint8 delivery
    for label, budget in (("48_48_24", (48, 48, 24)), ("32_32_16", (32, 32, 16))):
        pipeline = build_proposal(chunk=4194304, eval_budget=budget)
        params = pipeline.init(jax.random.PRNGKey(0))
        out[f"fps_{label}_u8"] = round(fps(render_u8, n_frames=8, depth=2, passes=2), 3)
        log(f"{label} uint8: {out[f'fps_{label}_u8']} fps")

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
