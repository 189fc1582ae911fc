"""Round-3 proposal-path performance diagnosis (VERDICT r2 weak #1 / next #2).

The shipped proposal estimator runs at ~25-30% MFU with no breakdown of
where the non-matmul time goes. This worker produces that breakdown and
measures the candidate fixes:

  1. jax.profiler traces of the one-level and two-level train steps,
     reduced to a per-op-category device-time table (the same kind of
     evidence the classic path has in docs/performance.md:40-42);
  2. phase attribution by differencing jitted subprograms (proposal fwd,
     final fwd, +interlevel, +bwd, +Adam);
  3. measured variants: 256-wide proposal MLP (128-wide matmuls underfill
     the MXU), no-interlevel-loss arm (costs the O(N_f x N_p) broadcast),
     32k-ray shape (the reported regression).

Run:  nohup python -u benchmarks/r3_proposal_profile.py > /tmp/r3_prof.log 2>&1 &
Never kill it mid-run (stale TPU lease).
"""

from __future__ import annotations

import glob
import json
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


def build_pipeline(n_rays=4096, image_hw=800, levels=2, prop_hidden=128, prop_pts=(64, 64),
                   final_pts=48, interlevel=True):
    from yanerf_tpu.pipelines import PIPELINES

    models = [
        dict(type="ProposalMLP", n_layers=4, hidden_dim=prop_hidden,
             n_harmonic_functions_xyz=10, compute_dtype="bfloat16")
        for _ in range(levels)
    ] + [
        dict(type="NeRFMLP", n_layers=8, input_skips=[5], n_harmonic_functions_xyz=10,
             n_harmonic_functions_dir=4, n_hidden_neurons_xyz=256, n_hidden_neurons_dir=128,
             latent_dim=0, color_dim=3, compute_dtype="bfloat16"),
    ]
    loss_weights = {"loss_rgb_mse": 1.0}
    if interlevel:
        loss_weights["loss_proposal"] = 1.0
    cfg = dict(
        type="NeRFPipeline",
        chunk_size_grid=2097152,
        num_passes=levels + 1,
        output_rasterized_mc=False,
        loss_weights=loss_weights,
        model=models,
        ray_sampler=dict(
            type="RaySampler",
            image_height=image_hw, image_width=image_hw,
            min_depth=2.0, max_depth=6.0,
            n_pts_per_ray_training=prop_pts[0],
            n_pts_per_ray_evaluation=prop_pts[0],
            n_rays_per_image_sampled_from_mask=n_rays,
            stratified_point_sampling_training=True,
            approx_top_k=True,
        ),
        renderer=dict(
            type="ProposalEmissionAbsorpsionRenderer",
            n_pts_per_ray_final_training=final_pts,
            n_pts_per_ray_final_evaluation=32,
            n_pts_per_ray_intermediate_training=list(prop_pts[1:levels]),
            n_pts_per_ray_intermediate_evaluation=list(prop_pts[1:levels]),
            bg_color=[0.0, 0.0, 0.0],
            density_noise_std_train=0.0,
            background_density_bias=1e-6,
        ),
        feature_extractor=[],
    )
    return PIPELINES.build(cfg)


def make_step(pipeline):
    import jax

    from yanerf_tpu.runners import create_optimizer, create_train_state, make_train_step
    from yanerf_tpu.utils.config import ConfigDict

    cfg = ConfigDict(dict(init_lr=5e-4, min_lr=5e-5, weight_decay=0.0, warmup_steps=1000,
                          warmup_lr=1e-5, lr_decay_type="exponential", lr_decay_rate=0.1,
                          lr_decay_iters=250000, num_iters=200000))
    opt = create_optimizer(cfg)
    state = create_train_state(pipeline.init(jax.random.PRNGKey(0)), opt)
    return make_train_step(pipeline, opt, mesh=None, donate=True), state


def time_step(step, state, batch, rng, n=100, warmup=5):
    for _ in range(warmup):
        state, preds = step(state, batch, rng)
    float(np.asarray(preds["objective"])[0])
    t0 = time.perf_counter()
    for _ in range(n):
        state, preds = step(state, batch, rng)
    float(np.asarray(preds["objective"])[0])
    return (time.perf_counter() - t0) / n, state


def parse_trace_op_table(logdir, top_k=25):
    """Reduce the newest xplane in ``logdir`` to (category, op) device times."""
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
    except Exception as e:  # pragma: no cover
        log(f"  [trace parse unavailable: {e}]")
        return None
    xplanes = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
                     key=os.path.getmtime)
    if not xplanes:
        log("  [no xplane.pb found]")
        return None
    data, _ = raw_to_tool_data.xspace_to_tool_data([xplanes[-1]], "framework_op_stats", params={})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    return data


def trace_step(step, state, batch, rng, logdir, n=20):
    import jax

    os.makedirs(logdir, exist_ok=True)
    state, preds = step(state, batch, rng)
    float(np.asarray(preds["objective"])[0])
    with jax.profiler.trace(logdir):
        for _ in range(n):
            state, preds = step(state, batch, rng)
        float(np.asarray(preds["objective"])[0])
    return state


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from yanerf_tpu.runners import prepare_batch
    from yanerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    t0 = time.time()
    x = jnp.ones((8, 8))
    log(f"claimed device after {time.time()-t0:.1f}s: {float(np.asarray(x.sum()))}")

    batch = prepare_batch(_example_batch(1, 800), W, None)
    rng = jax.random.PRNGKey(1)
    results = {}

    # ---- baseline arms ------------------------------------------------------
    arms = {
        "one_level": dict(levels=1, prop_pts=(64,)),
        "two_level": dict(levels=2, prop_pts=(64, 64)),
        "two_level_256wide": dict(levels=2, prop_pts=(64, 64), prop_hidden=256),
        "one_level_256wide": dict(levels=1, prop_pts=(64,), prop_hidden=256),
        "two_level_no_interlevel": dict(levels=2, prop_pts=(64, 64), interlevel=False),
    }
    for name, kw in arms.items():
        try:
            p = build_pipeline(**kw)
            step, state = make_step(p)
            dt, state = time_step(step, state, batch, rng)
            results[name] = dt
            log(f"TRAIN {name}: {dt*1e3:.2f} ms/step -> {4096/dt:.0f} rays/s")
        except Exception as e:
            log(f"TRAIN {name} FAILED: {type(e).__name__}: {str(e)[:300]}")

    # ---- 32k-ray shape (reported regression) --------------------------------
    for n_rays in (16384, 32768):
        try:
            p = build_pipeline(n_rays=n_rays, levels=2)
            step, state = make_step(p)
            dt, state = time_step(step, state, batch, rng, n=30)
            log(f"TRAIN two_level rays={n_rays}: {dt*1e3:.2f} ms/step -> {n_rays/dt:.0f} rays/s")
        except Exception as e:
            log(f"TRAIN rays={n_rays} FAILED: {type(e).__name__}: {str(e)[:300]}")

    # ---- eval path: chunk sweep + frame pipelining (VERDICT r2 #7) ----------
    from yanerf_tpu.ops.structures import EvaluationMode

    poses_np, focals_np, _ = _example_batch(1, 800)
    poses_j, focals_j = jnp.asarray(poses_np), jnp.asarray(focals_np)

    def build_render(chunk):
        p = build_pipeline(levels=2, prop_pts=(64, 64))
        p.chunk_size_grid = chunk
        params = p.init(jax.random.PRNGKey(0))

        def render_fn(params, rng, poses, focals):
            return p.forward(params, rng, poses=poses, focal_lengths=focals,
                             evaluation_mode=EvaluationMode.EVALUATION)["rendered_images"]

        return jax.jit(render_fn), params

    for chunk in (2097152, 4194304, 8388608, 16777216, 41943040):
        try:
            render, params = build_render(chunk)
            rngk = jax.random.PRNGKey(1)
            t0 = time.perf_counter()
            np.asarray(render(params, rngk, poses_j, focals_j))
            compile_t = time.perf_counter() - t0
            n_frames = 6
            t0 = time.perf_counter()
            for i in range(n_frames):
                frame = render(params, jax.random.fold_in(rngk, i), poses_j, focals_j)
            np.asarray(frame)
            dt = (time.perf_counter() - t0) / n_frames
            log(f"EVAL chunk={chunk}: {dt:.3f}s/frame = {1/dt:.3f} fps (compile {compile_t:.1f}s)")
        except Exception as e:
            log(f"EVAL chunk={chunk} FAILED: {type(e).__name__}: {str(e)[:300]}")

    # frame pipelining: dispatch frame i+1 before fetching frame i — the
    # device round-trip analog of AsyncVisWriter. Serial = fetch-then-dispatch.
    try:
        render, params = build_render(8388608)
        rngk = jax.random.PRNGKey(1)
        np.asarray(render(params, rngk, poses_j, focals_j))
        n_frames = 8
        # serial: full fetch before next dispatch
        t0 = time.perf_counter()
        for i in range(n_frames):
            np.asarray(render(params, jax.random.fold_in(rngk, i), poses_j, focals_j))
        serial = (time.perf_counter() - t0) / n_frames
        # pipelined: one frame in flight
        t0 = time.perf_counter()
        frames = []
        pending = render(params, jax.random.fold_in(rngk, 0), poses_j, focals_j)
        for i in range(1, n_frames):
            nxt = render(params, jax.random.fold_in(rngk, i), poses_j, focals_j)
            frames.append(np.asarray(pending))
            pending = nxt
        frames.append(np.asarray(pending))
        piped = (time.perf_counter() - t0) / n_frames
        log(f"EVAL pipelining: serial {serial:.3f}s/frame ({1/serial:.3f} fps) vs "
            f"pipelined {piped:.3f}s/frame ({1/piped:.3f} fps)")
    except Exception as e:
        log(f"EVAL pipelining FAILED: {type(e).__name__}: {str(e)[:300]}")

    # ---- traces -------------------------------------------------------------
    for name in ("one_level", "two_level"):
        try:
            p = build_pipeline(**{k: v for k, v in arms[name].items()})
            step, state = make_step(p)
            logdir = f"/tmp/r3_trace_{name}"
            state = trace_step(step, state, batch, rng, logdir)
            log(f"TRACE {name}: wrote {logdir}")
            table = parse_trace_op_table(logdir)
            if table:
                out = f"/tmp/r3_opstats_{name}.json"
                with open(out, "w") as f:
                    f.write(table if isinstance(table, str) else json.dumps(table))
                log(f"TRACE {name}: op stats -> {out} ({len(table)} bytes)")
        except Exception as e:
            log(f"TRACE {name} FAILED: {type(e).__name__}: {str(e)[:300]}")

    log("WORKER DONE " + json.dumps({k: round(v * 1e3, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
