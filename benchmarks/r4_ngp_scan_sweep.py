"""Hash-grid scan-backward chunk-size sweep at the 4096-ray flagship shape.

Round 4 made the table-gradient scatter compile through the remote XLA
helper by reformulating it as a lax.scan accumulation
(models/hash_grid.py; YANERF_HASHGRID_BWD_SCAN_{CHUNK,THRESHOLD}), and
the 4096-ray lego_ngp train step ran for the first time in this
environment — but at 3.0 s/step: the default 32k scan chunk serializes
~6.3M updates/level into ~190 sequential scatter bodies. Larger chunks
trade that serialization against exactly the compile-size risk the scan
exists to avoid; this sweep finds the compile-safe speed point.

Each arm runs in a SUBPROCESS (the env knobs are read at import time, and
a helper crash must not take the sweep down). Results checkpoint into
results/ngp_scan_sweep.json after every arm.

Run:  nohup python -u benchmarks/r4_ngp_scan_sweep.py > /tmp/r4/ngp_sweep.log 2>&1 &
Never kill it mid-run (stale TPU lease).
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
OUT_JSON = REPO / "results" / "ngp_scan_sweep.json"
N_RAYS = int(os.environ.get("YANERF_SWEEP_RAYS", "4096"))  # tiny for CPU smoke

# (label, YANERF_HASHGRID_BWD_SCAN_CHUNK, YANERF_HASHGRID_BWD_SCAN_THRESHOLD)
# threshold 0 forces the scan path; a huge threshold forces the one-shot
# scatter path (the round-2/3 formulation — expected to crash the helper
# at this shape, but record it: the failure is nondeterministic).
ARMS = [
    ("scan_32k", 1 << 15, 0),
    ("scan_128k", 1 << 17, 0),
    ("scan_512k", 1 << 19, 0),
    ("scan_2m", 1 << 21, 0),
    ("scatter", 1 << 15, 1 << 30),
]


def arm_child(label: str) -> None:
    """Child mode: compile + time the 4096-ray NGP train step, print JSON."""
    sys.path.insert(0, str(REPO))
    import numpy as np

    import jax
    import jax.numpy as jnp

    from benchmarks.r3_ngp_shapes import W, ngp_pipeline
    from __graft_entry__ import _example_batch
    from yanerf_tpu.runners import (
        create_optimizer,
        create_train_state,
        make_train_step,
        prepare_batch,
    )
    from yanerf_tpu.utils.cache import enable_compilation_cache
    from yanerf_tpu.utils.config import ConfigDict

    enable_compilation_cache()
    t0 = time.time()
    print(f"[{label}] device: {float(np.asarray(jnp.ones((2,)).sum()))} "
          f"after {time.time()-t0:.1f}s", flush=True)

    pipeline = ngp_pipeline(N_RAYS)
    opt_cfg = ConfigDict(dict(init_lr=1e-2, min_lr=1e-3, weight_decay=0.0,
                              warmup_steps=200, warmup_lr=1e-4,
                              lr_decay_type="exponential", lr_decay_rate=0.1,
                              lr_decay_iters=20000, num_iters=20000))
    batch = prepare_batch(_example_batch(1, 800), W, None)
    rng = jax.random.PRNGKey(1)
    tx = create_optimizer(opt_cfg)
    state = create_train_state(pipeline.init(jax.random.PRNGKey(0)), tx)
    step = make_train_step(pipeline, tx, mesh=None, donate=True)

    t0 = time.time()
    state, preds = step(state, batch, rng)
    obj = float(np.asarray(preds["objective"])[0])  # value fetch = sync
    compile_s = time.time() - t0
    print(f"[{label}] compiled+step0 in {compile_s:.1f}s (obj {obj:.4f})", flush=True)

    n = 5
    t0 = time.time()
    for _ in range(n):
        state, preds = step(state, batch, rng)
    obj = float(np.asarray(preds["objective"])[0])
    dt = (time.time() - t0) / n
    print(json.dumps({"label": label, "ms_per_step": round(dt * 1e3, 1),
                      "rays_per_s": round(N_RAYS / dt, 1),
                      "compile_s": round(compile_s, 1),
                      "objective": obj}), flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--arm", default=None, help="internal: child arm label")
    args = parser.parse_args()
    if args.arm:
        arm_child(args.arm)
        return

    record = json.loads(OUT_JSON.read_text()) if OUT_JSON.exists() else None
    if not record or record.get("n_rays") != N_RAYS:
        # a record swept at a different shape (e.g. the 64-ray CPU smoke)
        # must not satisfy the resume check for the flagship sweep
        if record is not None:
            print(f"RESET: record is n_rays={record.get('n_rays')}, sweeping {N_RAYS}", flush=True)
        record = {"n_rays": N_RAYS, "arms": {}}
    for label, chunk, threshold in ARMS:
        if record["arms"].get(label, {}).get("ms_per_step") is not None:
            print(f"SKIP {label}: {record['arms'][label]}", flush=True)
            continue
        sys.path.insert(0, str(REPO / "benchmarks"))
        from _deadline import should_stop
        if should_stop(headroom_s=2400):
            print(f"DEADLINE: not starting {label}", flush=True)
            break
        env = dict(os.environ,
                   YANERF_HASHGRID_BWD_SCAN_CHUNK=str(chunk),
                   YANERF_HASHGRID_BWD_SCAN_THRESHOLD=str(threshold))
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-u", str(REPO / "benchmarks" / "r4_ngp_scan_sweep.py"),
             "--arm", label],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=2400,
        )
        result = None
        for ln in reversed(proc.stdout.splitlines()):
            try:
                cand = json.loads(ln)
                if cand.get("label") == label:
                    result = cand
                    break
            except Exception:
                continue
        if result is None:
            result = {"label": label, "ms_per_step": None, "returncode": proc.returncode,
                      "error": (proc.stdout + proc.stderr)[-600:]}
            print(f"FAIL {label}: rc={proc.returncode}", flush=True)
        result["wall_s"] = round(time.time() - t0, 1)
        record["arms"][label] = result
        OUT_JSON.write_text(json.dumps(record, indent=2) + "\n")
        print(f"DONE {label}: {result.get('ms_per_step')} ms/step", flush=True)
    print("NGP SCAN SWEEP DONE " + json.dumps(
        {k: v.get("ms_per_step") for k, v in record["arms"].items()}), flush=True)


if __name__ == "__main__":
    main()
