"""Fit a scene content box from a trained model's density field.

Evaluates the final-pass model's density on a lattice (chunked ``lax.map``,
same machinery as scripts/extract_mesh.py) and prints the tight AABB of the
occupied region — ready to paste into a config or ``--cfg_options`` as
``pipeline.ray_sampler.scene_aabb`` for per-ray depth tightening
(ops/rays.py::ray_aabb_bounds): the fixed sample budget concentrates where
the scene actually is, so a smaller point budget holds full quality.

    python scripts/fit_aabb.py --config configs/nerf/lego_proposal.yml \
        --checkpoint results/.../ckpts/ckpts_-001 --threshold 5

No reference analog (the reference samples every ray over the global
[min_depth, max_depth], ray_samplers/ray_sampler.py:389-401 is its only
bounds logic).
"""

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from yanerf_tpu.utils.config import Config, DictAction  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--resolution", type=int, default=128)
    parser.add_argument("--bounds", type=float, nargs=2, default=(-2.0, 2.0),
                        help="lo hi of the probed cube (must contain the scene)")
    parser.add_argument("--threshold", type=float, default=5.0,
                        help="occupancy density cutoff (sigma units)")
    parser.add_argument("--margin", type=float, default=0.05)
    parser.add_argument("--chunk", type=int, default=65536)
    parser.add_argument("--device", default=None, choices=["tpu", "cpu"])
    parser.add_argument("--cfg_options", nargs="+", action=DictAction)
    args = parser.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from yanerf_tpu.ops.mesh import evaluate_density_grid, fit_scene_aabb
    from yanerf_tpu.pipelines import PIPELINES

    config = Config.fromfile(args.config)
    if args.cfg_options:
        config.merge_from_dict(args.cfg_options)

    pipeline = PIPELINES.build(config.pipeline)
    params = pipeline.init(jax.random.PRNGKey(config.runner.get("seed", 0)))
    if args.checkpoint:
        from yanerf_tpu.runners import load_checkpoint

        params = load_checkpoint(args.checkpoint)["restored"]["params"]

    model = pipeline.implicit_functions[-1]
    model_params = params["implicit_functions"][-1]

    print(f"evaluating density on a {args.resolution}^3 lattice (bounds {args.bounds})...", flush=True)
    grid = evaluate_density_grid(
        model, model_params, resolution=args.resolution, bounds=tuple(args.bounds), chunk=args.chunk
    )
    aabb = fit_scene_aabb(grid, tuple(args.bounds), args.threshold, margin=args.margin)
    import numpy as np

    touches = (grid > args.threshold) & ~np.pad(
        np.ones(tuple(s - 2 for s in grid.shape), bool), 1, constant_values=False
    )
    if touches.any():
        print(
            "WARNING: occupied density touches the probe boundary — the scene "
            "may extend beyond --bounds; re-run with a larger cube.",
            flush=True,
        )
    flat = [round(float(v), 4) for v in aabb.reshape(-1)]
    occ_frac = float((grid > args.threshold).mean())
    box_vol = float((aabb[1] - aabb[0]).prod())
    probe_vol = (args.bounds[1] - args.bounds[0]) ** 3
    print(f"occupied lattice fraction: {occ_frac * 100:.2f}% above sigma {args.threshold}")
    print(f"aabb: {flat}  (box/probe volume: {box_vol / probe_vol * 100:.1f}%)")
    print("paste into a config:   ray_sampler: {{ scene_aabb: {} }}".format(flat))
    print("or on the CLI:         --cfg_options pipeline.ray_sampler.scene_aabb='{}'".format(
        json.dumps(flat)))


if __name__ == "__main__":
    main()
