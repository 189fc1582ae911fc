"""Scene-AABB depth-tightening A/B: quality at reduced eval point budgets.

``pipeline.ray_sampler.scene_aabb`` (ops/rays.py::ray_aabb_bounds)
concentrates the fixed per-ray sample budget inside the content box fitted
from the trained density field (scripts/fit_aabb.py). fps at a given
budget is unchanged (identical shapes; the slab test fuses into ray
generation) — the win, if any, is HOLDING QUALITY AT A SMALLER BUDGET,
which moves the measured quality/fps eval frontier
(results/eval_frontier.json) outward.

Eval-only knob on an unchanged checkpoint (the density field is defined
everywhere, so resampling its depth interval needs no retraining).

This worker measures test-set PSNR of the trained two-level model
(synth800_proposal_2p40, the 39.6-PSNR-class checkpoint the frontier was
measured on) at several eval budgets, with and without the fitted box,
via `scripts/run.py --test_only` subprocesses.

Run:  nohup python -u benchmarks/r3_aabb_eval.py > /tmp/aabb_eval.log 2>&1 &
It WAITS for any PID in --wait_pid (default: none) to exit before touching
the TPU. Never kill it mid-run (stale lease) — it checkpoints per arm.
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
OUT_JSON = REPO / "results" / "aabb_eval.json"
WORK = REPO / "results" / "nerf" / "aabb_eval"
CKPT_RUN = REPO / "results" / "nerf" / "synth800_proposal_2p40" / "version_0"
BUDGETS = [(64, 64, 32), (32, 32, 16), (16, 16, 8), (8, 8, 4)]


def log(msg):
    print(msg, flush=True)


def wait_for_pid(pid: int):
    while Path(f"/proc/{pid}").exists():
        log(f"waiting for pid {pid} to release the TPU...")
        time.sleep(120)


def read_record():
    if OUT_JSON.exists():
        return json.loads(OUT_JSON.read_text())
    return {"checkpoint": str(CKPT_RUN), "runs": {}}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--wait_pid", type=int, default=None)
    args = parser.parse_args()
    if args.wait_pid:
        wait_for_pid(args.wait_pid)

    record = read_record()

    # 1. fit the content box from the trained final-pass density field
    # (in a subprocess so this parent never holds a TPU client while the
    # arm subprocesses run — the tunnel serializes concurrent clients)
    if "aabb" not in record:
        proc = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "fit_aabb.py"),
             "--config", str(CKPT_RUN / "config.yml"),
             "--checkpoint", str(CKPT_RUN / "ckpts" / "ckpts_-001"),
             "--resolution", "128", "--threshold", "5", "--margin", "0.05"],
            cwd=REPO, capture_output=True, text=True,
        )
        aabb_line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith("aabb: ")), None
        )
        if proc.returncode != 0 or aabb_line is None:
            log(f"fit_aabb FAILED rc={proc.returncode}\n{proc.stdout[-1000:]}\n{proc.stderr[-2000:]}")
            sys.exit(1)
        record["aabb"] = json.loads(aabb_line.split("aabb: ")[1].split("  (")[0])
        OUT_JSON.write_text(json.dumps(record, indent=2) + "\n")
        log(f"fitted aabb: {record['aabb']}")

    # 2. PSNR at each budget x {off, on}
    for budget in BUDGETS:
        p0, p1, pf = budget
        for use_box in (False, True):
            key = f"{p0}-{p1}-{pf}" + ("_aabb" if use_box else "_base")
            if record["runs"].get(key, {}).get("test_psnr") is not None:
                log(f"SKIP {key}: {record['runs'][key]['test_psnr']:.2f}")
                continue
            out_dir = WORK / key
            out_dir.mkdir(parents=True, exist_ok=True)
            opts = [
                f"pipeline.ray_sampler.n_pts_per_ray_evaluation={p0}",
                f"pipeline.renderer.n_pts_per_ray_intermediate_evaluation=[{p1}]",
                f"pipeline.renderer.n_pts_per_ray_final_evaluation={pf}",
            ]
            if use_box:
                opts.append("pipeline.ray_sampler.scene_aabb=" + json.dumps(record["aabb"]))
            t0 = time.time()
            proc = subprocess.run(
                [sys.executable, str(REPO / "scripts" / "run.py"),
                 "--config", str(CKPT_RUN / "config.yml"),
                 "--output_dir", str(out_dir),
                 "--checkpoint", str(CKPT_RUN / "ckpts" / "ckpts_-001"),
                 "--test_only", "--cfg_options", *opts],
                cwd=REPO, capture_output=True, text=True,
            )
            wall = time.time() - t0
            test_psnr = None
            # --test_only writes test_stats.json at the output_dir top level
            # (training runs put it under version_N/)
            stats = sorted(out_dir.glob("version_*/test_stats.json")) + (
                [out_dir / "test_stats.json"] if (out_dir / "test_stats.json").exists() else []
            )
            if proc.returncode == 0 and stats:
                lines = [ln for ln in stats[-1].read_text().splitlines() if ln.strip()]
                if lines:
                    test_psnr = json.loads(lines[-1]).get("test_loss_rgb_psnr")
            if proc.returncode != 0:
                log(f"FAIL {key}: rc={proc.returncode}\n{proc.stderr[-2000:]}")
            record["runs"][key] = {
                "budget": f"{p0}-{p1}-{pf}", "aabb": use_box,
                "test_psnr": test_psnr, "wall_s": round(wall, 1),
                "returncode": proc.returncode,
            }
            OUT_JSON.write_text(json.dumps(record, indent=2) + "\n")
            log(f"DONE {key}: psnr={test_psnr} ({wall:.0f}s)")

    # 3. summary: delta per budget
    record["summary"] = {}
    for budget in BUDGETS:
        b = f"{budget[0]}-{budget[1]}-{budget[2]}"
        base = record["runs"].get(b + "_base", {}).get("test_psnr")
        box = record["runs"].get(b + "_aabb", {}).get("test_psnr")
        if base is not None and box is not None:
            record["summary"][b] = {
                "base_psnr": round(base, 3), "aabb_psnr": round(box, 3),
                "delta_db": round(box - base, 3),
            }
    OUT_JSON.write_text(json.dumps(record, indent=2) + "\n")
    log("AABB EVAL DONE " + json.dumps(record["summary"]))


if __name__ == "__main__":
    main()
