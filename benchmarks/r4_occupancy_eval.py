"""Occupancy-grid empty-space-skipping A/B: eval quality AND fps per budget.

Round-4 follow-up to benchmarks/r3_aabb_eval.py (VERDICT r3 #3: attack
full-budget eval fps; "evaluate occupancy/empty-space masking for eval").
``pipeline.ray_sampler.occupancy_grid`` (ops/occupancy.py) tightens each
eval ray's depth interval to the occupied span along that ray — strictly
tighter than the scene-AABB slab chord wherever the ray passes through
empty box volume. Unlike the slab test it is NOT free (one
``(rays, n_probe)`` grid gather per eval batch), so this harness measures
both sides of the trade:

  * test-set PSNR at several eval budgets, scene_aabb (shipped baseline)
    vs scene_aabb + occupancy — via `scripts/run.py --test_only`
    subprocesses on the 39.6-PSNR-class two-level checkpoint;
  * 800x800 pipelined render fps at the same budgets, with and without the
    grid — bench.py's value-fetch-timed one-frame-in-flight method (the
    grid's CONTENT cannot change the fps: shapes are static; only the
    probe-gather overhead does, so random params are fine for timing).

Run:  nohup python -u benchmarks/r4_occupancy_eval.py > /tmp/occ_eval.log 2>&1 &
It checkpoints per arm into results/occupancy_eval.json. Never kill it
mid-run (stale TPU lease).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
OUT_JSON = REPO / "results" / "occupancy_eval.json"
WORK = REPO / "results" / "nerf" / "occupancy_eval"
CKPT_RUN = REPO / "results" / "nerf" / "synth800_proposal_2p40" / "version_0"
OCC_NPZ = WORK / "occupancy.npz"
# shipped fitted box for this checkpoint (configs/nerf/synth800_proposal.yml)
AABB = [-1.222, -1.1953, -1.5118, 1.1276, 1.2583, 0.9764]
BUDGETS = [(64, 64, 32), (48, 48, 24), (32, 32, 16), (16, 16, 8), (8, 8, 4)]
# (48-48-24 added round 5: ROADMAP #2's unmeasured point — the 39.5-class
# budget with the fitted AABB and the occfast bounds; earlier-round arms are
# skip-cached in the record, so only the new budget's arms run.)


def log(msg):
    print(msg, flush=True)


def read_record():
    if OUT_JSON.exists():
        return json.loads(OUT_JSON.read_text())
    return {"checkpoint": str(CKPT_RUN), "aabb": AABB, "runs": {}, "fps": {}}


def fps_arm(budget, occupancy_path, bf16_compositing=False, occ_mode="exact"):
    """Child mode: print one JSON line with pipelined render fps."""
    import numpy as np

    sys.path.insert(0, str(REPO))
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from bench import _proposal_pipeline
    from yanerf_tpu.ops.structures import EvaluationMode

    p0, p1, pf = budget
    pipeline = _proposal_pipeline(
        eval_sampler_pts=p0, eval_intermediate=(p1,), eval_final=pf
    )
    if bf16_compositing:
        import jax.numpy as _jnp

        pipeline.renderer.eval_compositing_dtype = _jnp.dtype("bfloat16")
    sampler = pipeline.ray_sampler
    for half in sampler._raysamplers.values():
        half.scene_aabb = np.asarray(AABB, np.float32).reshape(2, 3)
    if occupancy_path:
        from yanerf_tpu.ops.occupancy import (
            OccupancyBoundsSpec,
            coarsen_occupancy,
            load_occupancy,
        )

        occ = load_occupancy(occupancy_path)
        if occ_mode == "fast":
            # the round-4 cheap formulation (sampler defaults): coarse-to-
            # fine grids + block-2 eval-ray decimation, ~5x fewer gathers
            occ = OccupancyBoundsSpec(
                grid=occ, coarse=coarsen_occupancy(occ, 4),
                n_probe=64, n_probe_coarse=32, block=2,
            )
        sampler._raysamplers[EvaluationMode.EVALUATION].occupancy = occ

    poses_np, focals_np, _ = _example_batch(1, 800)
    params = pipeline.init(jax.random.PRNGKey(0))

    def render_fn(params, rng, poses, focals):
        preds = pipeline.forward(
            params, rng, poses=poses, focal_lengths=focals,
            evaluation_mode=EvaluationMode.EVALUATION,
        )
        return preds["rendered_images"]

    render = jax.jit(render_fn)
    rng = jax.random.PRNGKey(1)
    poses, focals = jnp.asarray(poses_np), jnp.asarray(focals_np)
    np.asarray(render(params, rng, poses, focals))  # compile + sync
    n_frames = 6
    best = 0.0
    for _ in range(2):
        start = time.perf_counter()
        pending = render(params, jax.random.fold_in(rng, 0), poses, focals)
        for i in range(1, n_frames):
            nxt = render(params, jax.random.fold_in(rng, i), poses, focals)
            np.asarray(pending)
            pending = nxt
        np.asarray(pending)
        best = max(best, n_frames / (time.perf_counter() - start))
    print(json.dumps({"fps": best}), flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--fps_arm", default=None, help="internal: 'p0,p1,pf'")
    parser.add_argument("--occupancy", default="", help="internal: occupancy npz or ''")
    parser.add_argument("--bf16_compositing", action="store_true")
    parser.add_argument("--occ_mode", default="exact", choices=("exact", "fast"))
    args = parser.parse_args()
    if args.fps_arm:
        fps_arm(tuple(int(x) for x in args.fps_arm.split(",")), args.occupancy or None,
                bf16_compositing=args.bf16_compositing, occ_mode=args.occ_mode)
        return

    WORK.mkdir(parents=True, exist_ok=True)
    record = read_record()

    def run_test_only(key: str, opts: list, meta: dict) -> None:
        """One --test_only PSNR arm into record['runs'][key] (skip if done)."""
        if record["runs"].get(key, {}).get("test_psnr") is not None:
            log(f"SKIP {key}: {record['runs'][key]['test_psnr']:.2f}")
            return
        from _deadline import should_stop
        if should_stop(headroom_s=900):
            log(f"DEADLINE: not starting {key}")
            sys.exit(0)
        out_dir = WORK / key
        out_dir.mkdir(parents=True, exist_ok=True)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "run.py"),
             "--config", str(CKPT_RUN / "config.yml"),
             "--output_dir", str(out_dir),
             "--checkpoint", str(CKPT_RUN / "ckpts" / "ckpts_-001"),
             "--test_only", "--cfg_options", *opts],
            cwd=REPO, capture_output=True, text=True,
        )
        test_psnr = None
        stats = sorted(out_dir.glob("version_*/test_stats.json")) + (
            [out_dir / "test_stats.json"] if (out_dir / "test_stats.json").exists() else []
        )
        if proc.returncode == 0 and stats:
            lines = [ln for ln in stats[-1].read_text().splitlines() if ln.strip()]
            if lines:
                test_psnr = json.loads(lines[-1]).get("test_loss_rgb_psnr")
        if proc.returncode != 0:
            log(f"FAIL {key}: rc={proc.returncode}\n{proc.stderr[-2000:]}")
        record["runs"][key] = dict(meta, test_psnr=test_psnr,
                                   wall_s=round(time.time() - t0, 1),
                                   returncode=proc.returncode)
        OUT_JSON.write_text(json.dumps(record, indent=2) + "\n")
        log(f"DONE {key}: psnr={test_psnr}")

    def run_fps(key: str, fps_argv: list) -> None:
        """One fps arm (child subprocess) into record['fps'][key]."""
        if record["fps"].get(key) is not None:
            log(f"SKIP fps {key}: {record['fps'][key]}")
            return
        from _deadline import should_stop
        if should_stop(headroom_s=900):
            log(f"DEADLINE: not starting fps {key}")
            sys.exit(0)
        proc = subprocess.run(
            [sys.executable, str(REPO / "benchmarks" / "r4_occupancy_eval.py"), *fps_argv],
            cwd=REPO, capture_output=True, text=True,
        )
        fps = None
        for ln in reversed(proc.stdout.splitlines()):
            try:
                fps = json.loads(ln)["fps"]
                break
            except Exception:
                continue
        if proc.returncode != 0:
            log(f"FAIL fps {key}: rc={proc.returncode}\n{proc.stderr[-1500:]}")
        record["fps"][key] = round(fps, 3) if fps else None
        OUT_JSON.write_text(json.dumps(record, indent=2) + "\n")
        log(f"DONE fps {key}: {fps}")

    # 1. fit the occupancy grid from the trained final-pass density field
    # (subprocess: the parent must never hold a TPU client alongside arms)
    if not OCC_NPZ.exists():
        proc = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "fit_occupancy.py"),
             "--config", str(CKPT_RUN / "config.yml"),
             "--checkpoint", str(CKPT_RUN / "ckpts" / "ckpts_-001"),
             "--out", str(OCC_NPZ),
             "--resolution", "128", "--threshold", "5", "--dilate", "1"],
            cwd=REPO, capture_output=True, text=True,
        )
        if proc.returncode != 0 or not OCC_NPZ.exists():
            log(f"fit_occupancy FAILED rc={proc.returncode}\n{proc.stdout[-1000:]}\n{proc.stderr[-2000:]}")
            sys.exit(1)
        frac_line = next((ln for ln in proc.stdout.splitlines() if "fraction" in ln), "")
        record["occupancy_fit"] = frac_line
        OUT_JSON.write_text(json.dumps(record, indent=2) + "\n")
        log(f"fitted occupancy: {frac_line}")

    def budget_opts(p0, p1, pf):
        return [
            f"pipeline.ray_sampler.n_pts_per_ray_evaluation={p0}",
            f"pipeline.renderer.n_pts_per_ray_intermediate_evaluation=[{p1}]",
            f"pipeline.renderer.n_pts_per_ray_final_evaluation={pf}",
            "pipeline.ray_sampler.scene_aabb=" + json.dumps(AABB),
        ]

    # arms: aabb-only baseline, aabb + exact occupancy (the original
    # single-stage 128-probe march), aabb + fast occupancy (the round-4
    # coarse-to-fine + block-2 decimated formulation, sampler defaults)
    occ_exact_opts = [
        f"pipeline.ray_sampler.occupancy_grid={OCC_NPZ}",
        "pipeline.ray_sampler.occupancy_coarse_factor=1",
        "pipeline.ray_sampler.occupancy_block=1",
    ]
    occ_fast_opts = [f"pipeline.ray_sampler.occupancy_grid={OCC_NPZ}"]
    ARMS = (("_aabb", []), ("_occ", occ_exact_opts), ("_occfast", occ_fast_opts))

    # 2. PSNR at each budget x arm
    for p0, p1, pf in BUDGETS:
        for suffix, extra in ARMS:
            key = f"{p0}-{p1}-{pf}{suffix}"
            run_test_only(key, budget_opts(p0, p1, pf) + extra,
                          {"budget": f"{p0}-{p1}-{pf}", "occupancy": suffix.lstrip("_")})

    # 3. fps at each budget x arm (subprocess per arm)
    for p0, p1, pf in BUDGETS:
        for suffix, _ in ARMS:
            key = f"{p0}-{p1}-{pf}{suffix}"
            argv = ["--fps_arm", f"{p0},{p1},{pf}",
                    "--occupancy", str(OCC_NPZ) if suffix != "_aabb" else ""]
            if suffix == "_occfast":
                argv += ["--occ_mode", "fast"]
            run_fps(key, argv)

    # 3b. bf16 eval-compositing experiment at full budget (VERDICT r3 #3
    # "try bf16 eval compositing"): PSNR + fps vs the 64-64-32_aabb baseline
    key = "64-64-32_bf16comp"
    run_test_only(
        key,
        budget_opts(64, 64, 32) + ["pipeline.renderer.eval_compositing_dtype=bfloat16"],
        {"budget": "64-64-32", "bf16_compositing": True},
    )
    run_fps(key, ["--fps_arm", "64,64,32", "--occupancy", "", "--bf16_compositing"])

    # 4. summary frontier rows
    record["summary"] = {}
    for budget in BUDGETS:
        b = f"{budget[0]}-{budget[1]}-{budget[2]}"
        base, occ = record["runs"].get(b + "_aabb", {}), record["runs"].get(b + "_occ", {})
        fast = record["runs"].get(b + "_occfast", {})
        if base.get("test_psnr") is not None and occ.get("test_psnr") is not None:
            record["summary"][b] = {
                "aabb_psnr": round(base["test_psnr"], 3),
                "occ_psnr": round(occ["test_psnr"], 3),
                "delta_db": round(occ["test_psnr"] - base["test_psnr"], 3),
                "aabb_fps": record["fps"].get(b + "_aabb"),
                "occ_fps": record["fps"].get(b + "_occ"),
            }
            if fast.get("test_psnr") is not None:
                record["summary"][b]["occfast_psnr"] = round(fast["test_psnr"], 3)
                record["summary"][b]["occfast_fps"] = record["fps"].get(b + "_occfast")
    OUT_JSON.write_text(json.dumps(record, indent=2) + "\n")
    log("OCCUPANCY EVAL DONE " + json.dumps(record["summary"]))


if __name__ == "__main__":
    main()
