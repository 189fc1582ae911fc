"""Eval-render throughput: 800x800 frames/sec on the flagship lego model.

Prints one JSON line. Baseline context: BASELINE.json targets >5 fps at
800x800 on a v5p-8; the reference renders one such frame in ~10s per chunked
python loop on a 3090-class GPU (not directly published; the north star is
the fps number itself).

Usage: python benchmarks/render_bench.py [--no-pallas] [--hw 800]
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pallas", action="store_true", help="use the fused Pallas MLP (off: XLA, currently faster)")
    parser.add_argument("--hw", type=int, default=800)
    parser.add_argument("--frames", type=int, default=5)
    parser.add_argument("--chunk", type=int, default=1048576)
    args = parser.parse_args()
    args.no_pallas = not args.pallas

    import jax

    from __graft_entry__ import _example_batch, _flagship_pipeline
    from yanerf_tpu.ops.structures import EvaluationMode

    pipeline = _flagship_pipeline(n_rays=4096, image_hw=args.hw, compute_dtype="bfloat16")
    pipeline.chunk_size_grid = args.chunk
    if not args.no_pallas:
        for fn in pipeline.implicit_functions:
            fn.use_pallas = True

    params = pipeline.init(jax.random.PRNGKey(0))
    poses, focals, _ = _example_batch(1, args.hw)
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def render(params, rng, poses, focals):
        preds = pipeline.forward(
            params, rng, poses=poses, focal_lengths=focals, evaluation_mode=EvaluationMode.EVALUATION
        )
        return preds["rendered_images"]

    frame = render(params, rng, poses, focals)
    np.asarray(frame)  # sync (compile + first frame)

    start = time.perf_counter()
    for i in range(args.frames):
        frame = render(params, jax.random.fold_in(rng, i), poses, focals)
    np.asarray(frame)
    elapsed = time.perf_counter() - start

    fps = args.frames / elapsed
    print(
        json.dumps(
            {
                "metric": f"eval_frames_per_sec_{args.hw}px",
                "value": round(fps, 3),
                "unit": f"frames/s ({args.hw}x{args.hw}, 64+192 pts, pallas={not args.no_pallas})",
                "vs_baseline": round(fps / 5.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
