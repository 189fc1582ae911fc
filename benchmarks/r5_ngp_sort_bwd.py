"""Measure the round-5 scatter-free hash-grid backward at the 4096-ray flagship.

VERDICT r4 #4: the lego_ngp flagship runs 2.9-3.0 s/step with BOTH the
one-shot scatter and every lax.scan chunk size (results/ngp_scan_sweep.json)
— the ~100M scatter-add updates/step are themselves the floor (TPU scatters
are issue-rate-bound). YANERF_HASHGRID_BWD=sort replaces them entirely:
sort-by-row + segmented tree-reduce + one gather per table row
(models/hash_grid.py::_bwd_sort, gradient-equality-tested on CPU).

Arms (each a subprocess; env knobs read at import):
  auto          — the shipped threshold/scan default (round-4 baseline)
  sort          — scatter-free, default 2^17 encode chunking
  sort_nochunk  — scatter-free + encode_chunk=0 (one sort per level instead
                  of one per lax.map chunk; bigger sorts, fewer of them —
                  also probes whether the sort lowering compiles one-shot)

Run: nohup python -u benchmarks/r5_ngp_sort_bwd.py > /tmp/r5_ngp.log 2>&1 &
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
OUT_JSON = REPO / "results" / "ngp_sort_bwd.json"
N_RAYS = int(os.environ.get("YANERF_SWEEP_RAYS", "4096"))

ARMS = [
    ("auto", {}),
    ("sort", {"YANERF_HASHGRID_BWD": "sort"}),
    ("sort_nochunk", {"YANERF_HASHGRID_BWD": "sort", "YANERF_NGP_ENCODE_CHUNK": "0"}),
]


def arm_child(label: str) -> None:
    sys.path.insert(0, str(REPO))
    sys.path.insert(0, str(REPO / "benchmarks"))
    import numpy as np

    import jax
    import jax.numpy as jnp

    from r3_ngp_shapes import W, ngp_pipeline
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
    encode_chunk = os.environ.get("YANERF_NGP_ENCODE_CHUNK")
    if encode_chunk is not None:
        for fn in pipeline.implicit_functions:
            if hasattr(fn, "encode_chunk"):
                fn.encode_chunk = int(encode_chunk)
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
    obj = float(np.asarray(preds["objective"])[0])
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
    parser.add_argument("--arm", default=None)
    args = parser.parse_args()
    if args.arm:
        arm_child(args.arm)
        return

    record = json.loads(OUT_JSON.read_text()) if OUT_JSON.exists() else None
    if not record or record.get("n_rays") != N_RAYS:
        record = {"n_rays": N_RAYS, "arms": {}}
    for label, env_extra in ARMS:
        if record["arms"].get(label, {}).get("ms_per_step") is not None:
            print(f"SKIP {label}: {record['arms'][label]}", flush=True)
            continue
        env = dict(os.environ, **env_extra)
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "-u", str(REPO / "benchmarks" / "r5_ngp_sort_bwd.py"),
                 "--arm", label],
                cwd=REPO, env=env, capture_output=True, text=True, timeout=2400,
            )
            stdout = proc.stdout
        except subprocess.TimeoutExpired as exc:
            stdout = (exc.stdout or b"").decode() if isinstance(exc.stdout, bytes) else (exc.stdout or "")
        print(stdout, flush=True)
        result = None
        for ln in reversed(stdout.splitlines()):
            try:
                cand = json.loads(ln)
                if cand.get("label") == label:
                    result = cand
                    break
            except Exception:  # noqa: BLE001
                continue
        record["arms"][label] = result or {"label": label, "ms_per_step": None,
                                          "wall_s": round(time.time() - t0, 1)}
        if result:
            result["wall_s"] = round(time.time() - t0, 1)
        OUT_JSON.write_text(json.dumps(record, indent=2) + "\n")
        print(f"[sweep] {label}: {record['arms'][label]}", flush=True)
    print("SWEEP DONE", flush=True)


if __name__ == "__main__":
    main()
