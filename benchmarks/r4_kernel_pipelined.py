"""Round-4 TPU measurement: software-pipelined Pallas fused MLP vs plain vs XLA.

VERDICT r3 #4: "one costed Pallas/pipelining experiment on the trace's
actual gap" — the round-2/3 traces localize the MLP fusions to a ~35-45%
MXU ceiling with the loss in the VPU-bound embedding/head ops around
~65%-MXU matmul chains. The pipelined kernel
(ops/pallas/nerf_mlp_kernel.py::_nerf_mlp_kernel_pipelined) overlaps the
VPU embedding of tile i against the MXU matmul chain of tile i-1 through a
2-slot VMEM scratch; bit-identical to the plain kernel
(tests/test_pallas.py::test_pallas_pipelined_kernel_bitwise_matches_plain).

This worker measures, at flagship shapes (NeRFMLP 8x256/dir128, bf16):
  * XLA forward (the shipped path),
  * plain fused Pallas forward,
  * pipelined fused Pallas forward,
over a tile sweep, timing against a value fetch (tunnel-safe), and writes
results/r4_kernel_pipelined.json with ms + TFLOP/s + MXU%% per arm.

Run:  nohup python -u benchmarks/r4_kernel_pipelined.py > /tmp/r4_kernel.log 2>&1 &
Never kill it mid-run (stale TPU lease). Checkpoint-per-arm: safe to re-run.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, str(REPO))
OUT_JSON = REPO / "results" / "r4_kernel_pipelined.json"

# v5 lite-class peak (the tunneled chip benches ~197 TFLOP/s bf16 dense in
# round-2's matmul probe; docs/performance.md)
PEAK_TFLOPS = 197.0

SHAPES = [
    ("proposal_final_48", 4096, 48),   # flagship two-level final pass
    ("classic_fine_192", 4096, 192),   # classic 64+128 fine-pass shape class
]
TILES = [512, 1024, 2048]


def log(msg):
    print(msg, flush=True)


def read_record():
    if OUT_JSON.exists():
        return json.loads(OUT_JSON.read_text())
    return {"peak_tflops_assumed": PEAK_TFLOPS, "arms": {}}


def main():
    import jax
    import jax.numpy as jnp

    from yanerf_tpu.models import MODELS
    from yanerf_tpu.ops.pallas.nerf_mlp_kernel import nerf_mlp_forward_pallas

    record = read_record()
    model = MODELS.build(dict(
        type="NeRFMLP", n_layers=8, input_skips=[5],
        n_harmonic_functions_xyz=10, n_harmonic_functions_dir=4,
        n_hidden_neurons_xyz=256, n_hidden_neurons_dir=128,
        latent_dim=0, color_dim=3, compute_dtype="bfloat16",
    ))
    params = model.init(jax.random.PRNGKey(0))

    # per-point matmul FLOPs (same accounting as the kernel's cost estimate)
    d_xyz = model.embedding_dim_xyz
    d_dir = model.embedding_dim_dir
    h, hd = model.n_hidden_neurons_xyz, model.n_hidden_neurons_dir
    flops_per_pt = 2 * (
        d_xyz * h
        + (model.n_layers - 1) * h * h
        + len(model.input_skips) * d_xyz * h
        + h * h  # intermediate linear
        + h * 1  # density head
        + (h + d_dir) * hd
        + hd * model.color_dim
    )

    from yanerf_tpu.ops.rays import ray_bundle_to_ray_points

    for shape_name, n_rays, n_pts in SHAPES:
        key = jax.random.PRNGKey(42)
        origins = jnp.zeros((n_rays, 3), jnp.float32)
        dirs = jax.random.normal(jax.random.fold_in(key, 1), (n_rays, 3), jnp.float32)
        lengths = jax.random.uniform(key, (n_rays, n_pts), jnp.float32, 2.0, 6.0)
        pts = ray_bundle_to_ray_points(origins, dirs, lengths)  # (n_rays, n_pts, 3)
        n_total = n_rays * n_pts
        tflop = n_total * flops_per_pt / 1e12

        def bench(fn, label, n_iter=30):
            arm_key = f"{shape_name}/{label}"
            # only a SUCCESSFUL record skips — error records (transient
            # tunnel/compile-helper failures) are retried on re-run
            if "ms" in record["arms"].get(arm_key, {}):
                log(f"SKIP {arm_key}: {record['arms'][arm_key]}")
                return
            try:
                t0 = time.time()
                d, c = fn()
                s0 = float(np.asarray(d).sum())  # sync
                log(f"{arm_key}: compile {time.time()-t0:.1f}s (sum {s0:.3e})")
                for _ in range(5):
                    d, c = fn()
                float(np.asarray(d).sum())
                t0 = time.perf_counter()
                for _ in range(n_iter):
                    d, c = fn()
                float(np.asarray(d).sum())
                dt = (time.perf_counter() - t0) / n_iter
                record["arms"][arm_key] = {
                    "ms": round(dt * 1e3, 3),
                    "tflops": round(tflop / dt, 2),
                    "mxu_pct": round(100.0 * tflop / dt / PEAK_TFLOPS, 1),
                }
            except Exception as exc:  # noqa: BLE001 — record and continue
                record["arms"][arm_key] = {"error": f"{type(exc).__name__}: {exc}"[:500]}
            OUT_JSON.write_text(json.dumps(record, indent=2) + "\n")
            log(f"DONE {arm_key}: {record['arms'][arm_key]}")

        # XLA arm: the shipped forward over the SAME ray bundle the Pallas
        # arms' points were derived from (apply computes points internally)
        xla = jax.jit(lambda o, dr, ln: model.apply(params, o, dr, ln, use_pallas=False))

        def xla_fn():
            out = xla(origins, dirs, lengths)
            return out["rays_densities"], out["rays_features"]

        bench(xla_fn, "xla")
        for tile in TILES:
            for pipelined in (False, True):
                label = f"pallas_{'pipe' if pipelined else 'plain'}_t{tile}"
                fn = jax.jit(lambda p, dr, _t=tile, _pl=pipelined: nerf_mlp_forward_pallas(
                    model, params, p, dr, tile=_t, interpret=False, pipelined=_pl))
                bench(lambda _f=fn: _f(pts, dirs), label)

    # summary: best pallas vs xla per shape
    summary = {}
    for shape_name, _, _ in SHAPES:
        arms = {k.split("/")[1]: v for k, v in record["arms"].items()
                if k.startswith(shape_name) and "ms" in v}
        if "xla" in arms and len(arms) > 1:
            best = min((v["ms"], k) for k, v in arms.items() if k != "xla")
            summary[shape_name] = {
                "xla_ms": arms["xla"]["ms"], "best_pallas": best[1],
                "best_ms": best[0],
                "speedup": round(arms["xla"]["ms"] / best[0], 3),
            }
    record["summary"] = summary
    OUT_JSON.write_text(json.dumps(record, indent=2) + "\n")
    log("R4 KERNEL DONE " + json.dumps(summary))


if __name__ == "__main__":
    main()
