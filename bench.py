"""Throughput benchmark: flagship configs on real hardware, ONE JSON line.

Headline metric: train-step throughput of the SHIPPED flagship — the
two-level proposal-estimator config (configs/nerf/lego_proposal.yml:
64 proposal pts on two 4x128 density MLPs -> 48 importance-sampled points
on the 8x256 NeRFMLP). Baseline: the reference reproduces lego in ~4 h of
200k iters x 4096 rays on 4x RTX 3090 (README.md:68) = 14.2k rays/s per
GPU-chip.

The same JSON line also records (VERDICT r2 #1):
  * classic_train_rays_per_sec_per_chip — the apples-to-apples 64+128
    schedule (lego_tpu.yml), the reference's exact per-iteration work;
  * fused_wall_ms_per_iter — end-to-end wall per optimizer step with
    K=20 fused dispatch (runner.steps_per_call), host latency included;
  * eval_fps_800px_full / eval_fps_800px_39psnr_32_32_16 /
    eval_fps_800px_frontier_16_16_8 — 800x800 render fps at the full eval
    budget (64-64-32, f32 delivery for cross-round continuity) and at the
    39.32- and 37.0-PSNR budgets (trained-checkpoint quality from
    results/eval_frontier.json) with device-side uint8 frame delivery —
    the format PNG/serving consume; the eval loop is host-delivery-bound
    at small budgets (results/r5_bisect.json);
  * time_to_35psnr_class_min — minutes for the 20k-iter tuned schedule
    (measured 34.96-36.63 test PSNR band, results/proposal_quality.json)
    at the fused wall rate measured HERE;
  * time_to_35psnr_min_measured_cli — the in-round MEASURED wall clock of
    one full scripts/run.py training (val cadence, checkpoints, final
    test; results/r5_time_to_quality.json).
"""

from __future__ import annotations

import json
import signal
import sys
import time
from typing import NamedTuple

import numpy as np

_T0 = time.perf_counter()


def _progress(msg: str) -> None:
    # progress goes to stderr so stdout stays JSON-only; through the slow
    # remote compile tunnel a silent multi-minute phase is indistinguishable
    # from a hang without this
    print(f"[bench +{time.perf_counter() - _T0:.0f}s] {msg}", file=sys.stderr, flush=True)


class PhaseTimeout(Exception):
    pass


def _run_phase(name: str, fn, deadline_s: float) -> bool:
    """Run one bench phase under a hard SIGALRM deadline.

    Round-3 postmortem: the bench ran five compile-heavy phases and printed
    its single JSON line only at the very end — one slow remote compile and
    the driver's timeout produced BENCH_r03.json with ``parsed: null``,
    losing the whole round's numbers. Now every phase is individually
    fenced, and the caller re-prints a complete JSON line after each phase,
    so a later stall can only cost the *later* fields.
    """

    def _handler(signum, frame):
        raise PhaseTimeout(name)

    done = False
    old = signal.signal(signal.SIGALRM, _handler)
    signal.alarm(max(1, int(deadline_s)))
    try:
        fn()
        done = True
        return True
    except PhaseTimeout:
        if done:
            # alarm delivered in the gap between fn() returning and
            # alarm(0) — the phase DID finish; don't discard its result
            return True
        _progress(f"{name}: TIMED OUT after {deadline_s:.0f}s — skipping to next phase")
        return False
    except Exception as exc:  # noqa: BLE001 — a failed phase must not kill the bench
        _progress(f"{name}: FAILED ({type(exc).__name__}: {exc}) — skipping")
        return False
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


class Wrapper(NamedTuple):
    poses: np.ndarray
    focal_lengths: np.ndarray
    image_rgb: np.ndarray


def _proposal_pipeline(
    n_rays=4096,
    image_hw=800,
    chunk=4194304,  # measured sweet spot of the round-3 chunk sweep (r3_eval_fps.json)
    eval_sampler_pts=64,
    eval_intermediate=(64,),
    eval_final=32,
):
    """The shipped two-level proposal config (lego_proposal.yml shapes)."""
    from yanerf_tpu.pipelines import PIPELINES

    cfg = dict(
        type="NeRFPipeline",
        chunk_size_grid=chunk,
        num_passes=3,
        output_rasterized_mc=False,
        loss_weights={"loss_rgb_mse": 1.0, "loss_proposal": 1.0},
        model=[
            dict(type="ProposalMLP", n_layers=4, hidden_dim=128,
                 n_harmonic_functions_xyz=10, compute_dtype="bfloat16"),
            dict(type="ProposalMLP", n_layers=4, hidden_dim=128,
                 n_harmonic_functions_xyz=10, compute_dtype="bfloat16"),
            dict(type="NeRFMLP", n_layers=8, input_skips=[5],
                 n_harmonic_functions_xyz=10, n_harmonic_functions_dir=4,
                 n_hidden_neurons_xyz=256, n_hidden_neurons_dir=128,
                 latent_dim=0, color_dim=3, compute_dtype="bfloat16"),
        ],
        ray_sampler=dict(
            type="RaySampler",
            image_height=image_hw,
            image_width=image_hw,
            min_depth=2.0,
            max_depth=6.0,
            n_pts_per_ray_training=64,
            n_pts_per_ray_evaluation=eval_sampler_pts,
            n_rays_per_image_sampled_from_mask=n_rays,
            stratified_point_sampling_training=True,
            # the shipped flagship sampler: replacement sampling (uniform
            # case = bare randint) — quality-neutral at 3 seeds
            # (results/ab_r3.json two_level_repl), removes the top-k sort
            pixel_replacement=True,
        ),
        renderer=dict(
            type="ProposalEmissionAbsorpsionRenderer",
            n_pts_per_ray_final_training=48,
            n_pts_per_ray_final_evaluation=eval_final,
            n_pts_per_ray_intermediate_training=[64],
            n_pts_per_ray_intermediate_evaluation=list(eval_intermediate),
            bg_color=[0.0, 0.0, 0.0],
            density_noise_std_train=0.0,
            background_density_bias=1e-6,
        ),
        feature_extractor=[],
    )
    return PIPELINES.build(cfg)


def _runner_cfg():
    from yanerf_tpu.utils.config import ConfigDict

    return ConfigDict(
        dict(
            init_lr=5e-4, min_lr=5e-5, weight_decay=0.0, warmup_steps=1000, warmup_lr=1e-5,
            lr_decay_type="exponential", lr_decay_rate=0.1, lr_decay_iters=250000, num_iters=200000,
        )
    )


def _time_train_steps(pipeline, batch, n_steps, warmup=3):
    """Per-dispatch train-step timing; sync via value fetch (tunnel-safe)."""
    import jax

    from yanerf_tpu.runners import create_optimizer, create_train_state, make_train_step

    optimizer = create_optimizer(_runner_cfg())
    state = create_train_state(pipeline.init(jax.random.PRNGKey(0)), optimizer)
    step = make_train_step(pipeline, optimizer, mesh=None, donate=True)
    rng = jax.random.PRNGKey(1)
    for _ in range(warmup):
        state, preds = step(state, batch, rng)
    float(np.asarray(preds["objective"])[0])
    start = time.perf_counter()
    for _ in range(n_steps):
        state, preds = step(state, batch, rng)
    float(np.asarray(preds["objective"])[0])
    return (time.perf_counter() - start) / n_steps


def _time_fused(pipeline, image_hw, steps_per_call=20, n_dispatch=10):
    """End-to-end wall ms/iter with the K-step fused dispatch (host incl.)."""
    import jax

    from __graft_entry__ import _example_batch
    from yanerf_tpu.runners import create_optimizer, create_train_state, make_train_step_fused

    optimizer = create_optimizer(_runner_cfg())
    state = create_train_state(pipeline.init(jax.random.PRNGKey(0)), optimizer)
    fused = make_train_step_fused(pipeline, optimizer, Wrapper, mesh=None, donate=True)
    n_frames = 8
    arrays = tuple(jax.device_put(a) for a in _example_batch(n_frames, image_hw))
    rng = jax.random.PRNGKey(1)
    rs = np.random.RandomState(0)

    def idx_matrix():
        return jax.numpy.asarray(rs.randint(0, n_frames, size=(steps_per_call, 1)))

    state, hist = fused(state, arrays, idx_matrix(), rng)  # compile
    float(np.asarray(hist["objective"])[-1, 0])
    start = time.perf_counter()
    for _ in range(n_dispatch):
        state, hist = fused(state, arrays, idx_matrix(), rng)
    float(np.asarray(hist["objective"])[-1, 0])
    return (time.perf_counter() - start) / (n_dispatch * steps_per_call)


def _time_eval_fps(pipeline, image_hw=800, n_frames=5, n_passes=2, uint8_delivery=False, depth=2):
    """Frames/s with the shipped eval method: ``depth`` frames in flight
    (frame i+depth dispatched before frame i's value fetch — exactly
    eval_one_epoch's pipelining, default eval_frames_in_flight=2), timed
    against value fetches. Best of ``n_passes`` passes: the pooled tunnel
    occasionally serializes a pass 3-4x slower (a 0.355 fps anomaly in an
    early round-3 bench vs 1.44-1.55 on re-measure).

    uint8_delivery: cast frames to uint8 ON DEVICE before the host fetch —
    the format PNG writing and serving consume anyway. At small point
    budgets the eval loop is host-delivery-bound through the tunnel (the
    round-5 bisect measured identical code swinging 2.4-4.1 fps at f32;
    results/r5_bisect.json), and uint8 delivery + depth-2 pipelining
    recovers the >5 fps class (5.35 fps at 16-16-8, 5.14 at 32-32-16 in
    the same sessions; depth 1 leaves 32-32-16 at ~3.5)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from yanerf_tpu.ops.structures import EvaluationMode

    poses_np, focals_np, _ = _example_batch(1, image_hw)
    params = pipeline.init(jax.random.PRNGKey(0))

    def render_fn(params, rng, poses, focals):
        preds = pipeline.forward(
            params, rng, poses=poses, focal_lengths=focals,
            evaluation_mode=EvaluationMode.EVALUATION,
        )
        img = preds["rendered_images"]
        if uint8_delivery:
            img = jnp.clip(img * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
        return img

    render = jax.jit(render_fn)
    rng = jax.random.PRNGKey(1)
    poses, focals = jnp.asarray(poses_np), jnp.asarray(focals_np)
    np.asarray(render(params, rng, poses, focals))  # compile + sync
    best = 0.0
    for _ in range(n_passes):
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


_BASELINE = 200_000 * 4096 / (4 * 3600) / 4  # ~14.2k rays/s per ref GPU (ref README.md:68)

_EMITTED_HEADLINE = False


def _emit_error_record(reason: str) -> None:
    """Last-resort parseable record when nothing could be measured.

    A dead tunnel relay at driver time should read as "unmeasurable this
    run" (value 0, explicit error field), not as an empty-stdout repeat of
    the round-3 parsed=null artifact. Never called once a real headline
    line has been printed.
    """
    if _EMITTED_HEADLINE:
        return
    print(
        json.dumps(
            {
                "metric": "proposal_train_rays_per_sec_per_chip",
                "value": 0.0,
                "unit": (
                    "UNMEASURED — " + reason + "; in-round measured values live in results/*.json"
                ),
                "vs_baseline": 0.0,
                "error": "tpu_backend_unreachable",
            }
        ),
        flush=True,
    )


def _emit(results: dict) -> None:
    """Print ONE complete JSON line from whatever has been measured so far.

    Called after every phase; each line is a superset of the previous one,
    so the driver's "last parsable line" is always the richest record even
    if the process is timeout-killed mid-phase.
    """
    line = None
    if "proposal_rays" in results:
        line = {
            "metric": "proposal_train_rays_per_sec_per_chip",
            "value": round(results["proposal_rays"], 1),
            "unit": "rays/s/chip (shipped two-level proposal config: 4096 rays, 64->64->48 pts, bf16)",
            "vs_baseline": round(results["proposal_rays"] / _BASELINE, 3),
        }
    elif "classic_rays" in results:
        line = {
            "metric": "classic_train_rays_per_sec_per_chip",
            "value": round(results["classic_rays"], 1),
            "unit": "rays/s/chip (reference 64+128 schedule: 4096 rays, bf16)",
            "vs_baseline": round(results["classic_rays"] / _BASELINE, 3),
        }
    if line is None:
        return
    global _EMITTED_HEADLINE
    _EMITTED_HEADLINE = True
    if "classic_rays" in results:
        line["classic_train_rays_per_sec_per_chip"] = round(results["classic_rays"], 1)
        line["classic_vs_baseline"] = round(results["classic_rays"] / _BASELINE, 3)
    if "fused_s" in results:
        line["fused_wall_ms_per_iter"] = round(results["fused_s"] * 1e3, 2)
        # minutes for the tuned 20k-iter schedule (34.96-36.63 test PSNR
        # band, results/proposal_quality.json) at the fused rate measured here
        line["time_to_35psnr_class_min"] = round(results["fused_s"] * 20_000 / 60.0, 2)
    if "ttq_measured_min" in results:
        # MEASURED full-CLI wall clock (scripts/run.py, val + checkpoints +
        # best-model monitor + final test) to the 35-PSNR class, recorded
        # in-round by benchmarks/r5_time_to_quality.py
        line["time_to_35psnr_min_measured_cli"] = results["ttq_measured_min"]
        line["time_to_35psnr_measured_test_psnr"] = results.get("ttq_psnr")
    if "fps_full" in results:
        line["eval_fps_800px_full_budget"] = round(results["fps_full"], 3)
    if "fps_frontier" in results:
        # uint8 frame delivery (what PNG/serving consume); trained-checkpoint
        # quality at this budget: 37.0-37.3 test PSNR (results/eval_frontier
        # .json, results/occupancy_eval.json)
        line["eval_fps_800px_frontier_16_16_8"] = round(results["fps_frontier"], 3)
    if "fps_39psnr" in results:
        # the 32-32-16 eval budget measured 39.32 test PSNR on the trained
        # two-level checkpoint (results/eval_frontier.json); uint8 delivery
        line["eval_fps_800px_39psnr_32_32_16"] = round(results["fps_39psnr"], 3)
    print(json.dumps(line), flush=True)


def main():
    import os

    budget_s = float(os.environ.get("YANERF_BENCH_BUDGET_S", "1320"))

    # Backend init is fenced too: with the axon tunnel relay dead, a bare
    # jax.devices() retries discovery forever (observed: one init warning
    # every ~25 min, zero output) and the driver's timeout would record
    # parsed=null. Better to die fast and loud.
    init_box: dict = {}

    def _init_backend():
        import jax

        from yanerf_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        init_box["n_chips"] = jax.local_device_count()
        init_box["platform"] = jax.devices()[0].platform

    # SIGALRM only surfaces once bytecode runs again; if discovery blocks in
    # a single long native call, a daemon watchdog hard-exits instead.
    import os as _os
    import threading

    def _watchdog():
        if "n_chips" not in init_box:
            _progress("backend_init watchdog fired — hard exit")
            _emit_error_record("TPU backend init hung (tunnel relay down?)")
            _os._exit(1)

    _wd = threading.Timer(min(330.0, budget_s / 2 + 30.0), _watchdog)
    _wd.daemon = True  # must not keep a finished bench alive
    _wd.start()

    # Global backstop: phases are SIGALRM-fenced, but an alarm cannot
    # interrupt one long native call (measured: a dead-tunnel device fetch
    # sleeps ~25 min per retry). Past budget+grace, hard-exit — stdout
    # already holds a complete JSON line per finished phase.
    def _global_watchdog():
        _progress("global budget watchdog fired — hard exit (JSON so far stands)")
        _emit_error_record("budget exhausted before any headline phase completed")
        _os._exit(2)

    _gwd = threading.Timer(budget_s + 90.0, _global_watchdog)
    _gwd.daemon = True
    _gwd.start()
    # success criterion is the evidence (init_box populated), not the
    # fence's return value — immune to the alarm-after-completion race
    if not _run_phase("backend_init", _init_backend, min(300.0, budget_s / 2)) and (
        "n_chips" not in init_box
    ):
        _progress("device backend unreachable (tunnel down?) — emitting error record")
        _emit_error_record("TPU backend unreachable (axon tunnel relay down)")
        sys.exit(1)

    import jax  # noqa: F401  (already initialized above)

    from __graft_entry__ import _example_batch, _flagship_pipeline
    from yanerf_tpu.runners import prepare_batch

    N_RAYS = 4096
    IMAGE_HW = 800
    n_chips = init_box["n_chips"]
    _progress(f"devices: {n_chips} ({init_box['platform']}); budget {budget_s:.0f}s")
    batch = prepare_batch(_example_batch(1, IMAGE_HW), Wrapper, None)
    results: dict = {}

    def remaining() -> float:
        return budget_s - (time.perf_counter() - _T0)

    # Phases in VALUE order: the headline metric first, enrichments after.
    # Each phase is fenced by a hard deadline and followed by a fresh
    # complete JSON line (see _run_phase docstring for the round-3 story).

    def phase_proposal():
        _progress("proposal train step: compiling...")
        prop = _proposal_pipeline(n_rays=N_RAYS, image_hw=IMAGE_HW)
        prop_dt = _time_train_steps(prop, batch, n_steps=100)
        results["proposal_rays"] = N_RAYS / prop_dt / n_chips
        _progress(f"proposal: {prop_dt*1e3:.1f} ms/step = {results['proposal_rays']:.0f} rays/s/chip")

    def phase_classic():
        _progress("classic train step: compiling...")
        classic = _flagship_pipeline(
            n_rays=N_RAYS, image_hw=IMAGE_HW, compute_dtype="bfloat16", approx_top_k=True
        )
        classic_dt = _time_train_steps(classic, batch, n_steps=50)
        results["classic_rays"] = N_RAYS / classic_dt / n_chips
        _progress(f"classic: {classic_dt*1e3:.1f} ms/step = {results['classic_rays']:.0f} rays/s/chip")

    def phase_fused():
        _progress("fused K=20 dispatch: compiling...")
        results["fused_s"] = _time_fused(_proposal_pipeline(n_rays=N_RAYS, image_hw=IMAGE_HW), IMAGE_HW)
        _progress(f"fused: {results['fused_s']*1e3:.1f} ms/iter wall")

    def phase_eval_full():
        _progress("eval full budget: compiling...")
        results["fps_full"] = _time_eval_fps(_proposal_pipeline(n_rays=N_RAYS, image_hw=IMAGE_HW))
        _progress(f"eval full: {results['fps_full']:.2f} fps")

    def phase_eval_frontier():
        _progress("eval frontier (16-16-8, uint8 delivery): compiling...")
        results["fps_frontier"] = _time_eval_fps(
            _proposal_pipeline(
                n_rays=N_RAYS, image_hw=IMAGE_HW,
                eval_sampler_pts=16, eval_intermediate=(16,), eval_final=8,
            ),
            n_frames=8,
            uint8_delivery=True,
        )
        _progress(f"eval frontier: {results['fps_frontier']:.2f} fps")

    def phase_eval_39psnr():
        _progress("eval 39-PSNR class (32-32-16, uint8 delivery): compiling...")
        results["fps_39psnr"] = _time_eval_fps(
            _proposal_pipeline(
                n_rays=N_RAYS, image_hw=IMAGE_HW,
                eval_sampler_pts=32, eval_intermediate=(32,), eval_final=16,
            ),
            n_frames=8,
            uint8_delivery=True,
        )
        _progress(f"eval 39-PSNR class: {results['fps_39psnr']:.2f} fps")

    def phase_ttq_measured():
        # no device work: surface the in-round measured full-CLI wall clock
        import os.path as osp

        path = osp.join(osp.dirname(osp.abspath(__file__)), "results", "r5_time_to_quality.json")
        if osp.exists(path):
            with open(path) as fp:
                rec = json.load(fp)
            if rec.get("wall_min") is not None:
                results["ttq_measured_min"] = round(float(rec["wall_min"]), 2)
                results["ttq_psnr"] = round(float(rec.get("test_psnr", 0.0)), 2)
                _progress(
                    f"measured CLI time-to-quality: {results['ttq_measured_min']} min "
                    f"to {results['ttq_psnr']} test PSNR (results/r5_time_to_quality.json)"
                )

    phases = [
        ("proposal", phase_proposal, 600.0),
        ("classic", phase_classic, 360.0),
        ("fused", phase_fused, 360.0),
        ("ttq_measured", phase_ttq_measured, 30.0),
        ("eval_full", phase_eval_full, 300.0),
        ("eval_39psnr", phase_eval_39psnr, 240.0),
        ("eval_frontier", phase_eval_frontier, 240.0),
    ]
    for name, fn, deadline in phases:
        left = remaining()
        if left < 90.0:
            _progress(f"{name}: SKIPPED (only {left:.0f}s of budget left)")
            continue
        _run_phase(name, fn, min(deadline, left))
        _emit(results)

    if "proposal_rays" not in results and "classic_rays" not in results:
        # enrichment-only results (fused/eval) never produce a headline
        # line (_emit returns early), so stdout would be empty — emit the
        # explicit error record and exit nonzero so the driver records a
        # failure instead of parsed=null with rc=0
        _progress("no headline phase completed")
        _emit_error_record("all headline phases failed or timed out")
        sys.exit(1)


if __name__ == "__main__":
    main()
