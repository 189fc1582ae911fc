"""Measure the round-3 speed fixes from the trace diagnosis.

From benchmarks/r3_proposal_profile.py traces: Adam's ~30 per-leaf fusions
cost ~1.4 ms/step and the (approx) top-k ray sampler ~1.2 ms/step of the
13.9 ms one-level proposal step. Fixes measured here: optax.flatten
(shipped as the OPT-IN runner.flatten_optimizer — the measurement below
came out a wash, so the default stays off) and ray_sampler.
pixel_replacement (cumsum+searchsorted).
This worker measures both, plus the classic config with flatten, and
re-measures the full-budget eval fps (the bench saw an anomalous 0.355
vs the sweep's 1.35-1.46).

Run:  nohup python -u benchmarks/r3_speed_followup.py > /tmp/r3_speed.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time
from typing import NamedTuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from r3_proposal_profile import W, build_pipeline, make_step, time_step  # noqa: E402


def log(msg):
    print(msg, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch, _flagship_pipeline
    from yanerf_tpu.ops.structures import EvaluationMode
    from yanerf_tpu.runners import prepare_batch
    from yanerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    t0 = time.time()
    log(f"claimed device: {float(np.asarray(jnp.ones((2,)).sum()))} after {time.time()-t0:.1f}s")

    batch = prepare_batch(_example_batch(1, 800), W, None)
    rng = jax.random.PRNGKey(1)

    arms = {
        "one_level_flat": dict(levels=1, prop_pts=(64,)),
        "two_level_flat": dict(levels=2, prop_pts=(64, 64)),
    }
    for name, kw in arms.items():
        for replacement in (False, True):
            label = name + ("_repl" if replacement else "")
            try:
                p = build_pipeline(**kw)
                if replacement:
                    for rs in p.ray_sampler._raysamplers.values():
                        rs.pixel_replacement = True
                step, state = make_step(p)
                dt, state = time_step(step, state, batch, rng)
                log(f"TRAIN {label}: {dt*1e3:.2f} ms/step -> {4096/dt:.0f} rays/s")
            except Exception as e:
                log(f"TRAIN {label} FAILED: {type(e).__name__}: {str(e)[:300]}")

    # classic config with the flattened optimizer (+ replacement variant)
    for replacement in (False, True):
        label = "classic_flat" + ("_repl" if replacement else "")
        try:
            p = _flagship_pipeline(n_rays=4096, image_hw=800, compute_dtype="bfloat16",
                                   approx_top_k=True)
            if replacement:
                for rs in p.ray_sampler._raysamplers.values():
                    rs.pixel_replacement = True
            step, state = make_step(p)
            dt, state = time_step(step, state, batch, rng, n=50)
            log(f"TRAIN {label}: {dt*1e3:.2f} ms/step -> {4096/dt:.0f} rays/s")
        except Exception as e:
            log(f"TRAIN {label} FAILED: {type(e).__name__}: {str(e)[:300]}")

    # eval fps ladder at 4M chunks: full budget (39.65 PSNR on the trained
    # model, results/eval_frontier.json), 48-48-24 (39.53), 32-32-16
    # (39.32) — the VERDICT #7 target is >=2 fps in the 39.5-PSNR class.
    # Budgets are eval-only knobs on an unchanged checkpoint.
    poses_np, focals_np, _ = _example_batch(1, 800)
    poses_j, focals_j = jnp.asarray(poses_np), jnp.asarray(focals_np)
    for label, budget in (("64-64-32", (64, 64, 32)), ("48-48-24", (48, 48, 24)),
                          ("32-32-16", (32, 32, 16))):
        try:
            p = build_pipeline(levels=2, prop_pts=(64, 64))
            p.chunk_size_grid = 4194304
            s0, s1, fin = budget
            for rs in p.ray_sampler._raysamplers.values():
                rs.n_pts_per_ray = s0
            from yanerf_tpu.ops.structures import EvaluationMode as EM
            p.renderer._intermediate_cfg[EM.EVALUATION] = (s1,)
            p.renderer._final_cfg[EM.EVALUATION] = (fin, False)
            params = p.init(jax.random.PRNGKey(0))

            def render_fn(params, rng, poses, focals):
                return p.forward(params, rng, poses=poses, focal_lengths=focals,
                                 evaluation_mode=EvaluationMode.EVALUATION)["rendered_images"]

            render = jax.jit(render_fn)
            rngk = jax.random.PRNGKey(1)
            np.asarray(render(params, rngk, poses_j, focals_j))
            n_frames = 6
            t0 = time.perf_counter()
            pending = render(params, jax.random.fold_in(rngk, 0), poses_j, focals_j)
            for i in range(1, n_frames):
                nxt = render(params, jax.random.fold_in(rngk, i), poses_j, focals_j)
                np.asarray(pending)
                pending = nxt
            np.asarray(pending)
            dt = (time.perf_counter() - t0) / n_frames
            log(f"EVAL budget {label} chunk=4M pipelined: {dt:.3f}s/frame = {1/dt:.3f} fps")
        except Exception as e:
            log(f"EVAL budget {label} FAILED: {type(e).__name__}: {str(e)[:300]}")

    # eval full budget re-measure (bench anomaly check) at chunks 2M/4M
    for chunk in (2097152, 4194304):
        try:
            p = build_pipeline(levels=2, prop_pts=(64, 64))
            p.chunk_size_grid = chunk
            params = p.init(jax.random.PRNGKey(0))

            def render_fn(params, rng, poses, focals):
                return p.forward(params, rng, poses=poses, focal_lengths=focals,
                                 evaluation_mode=EvaluationMode.EVALUATION)["rendered_images"]

            render = jax.jit(render_fn)
            rngk = jax.random.PRNGKey(1)
            np.asarray(render(params, rngk, poses_j, focals_j))
            n_frames = 6
            t0 = time.perf_counter()
            for i in range(n_frames):
                frame = render(params, jax.random.fold_in(rngk, i), poses_j, focals_j)
            np.asarray(frame)
            dt = (time.perf_counter() - t0) / n_frames
            log(f"EVAL full budget chunk={chunk}: {dt:.3f}s/frame = {1/dt:.3f} fps")
        except Exception as e:
            log(f"EVAL chunk={chunk} FAILED: {type(e).__name__}: {str(e)[:300]}")

    log("WORKER DONE")


if __name__ == "__main__":
    main()
