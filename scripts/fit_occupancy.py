"""Fit an occupancy grid from a trained model's density field.

Evaluates the final-pass model's density on a lattice (chunked ``lax.map``,
same machinery as scripts/fit_aabb.py), thresholds + dilates it into a
binary occupancy grid (ops/occupancy.py), and saves it to ``.npz`` — ready
to reference from a config as ``pipeline.ray_sampler.occupancy_grid`` for
per-ray empty-space skipping at eval: each ray's fixed sample budget is
concentrated on the occupied span along that ray, so a smaller point
budget holds full quality (the eval-fps lever).

    python scripts/fit_occupancy.py --config configs/nerf/lego_proposal.yml \
        --checkpoint results/.../ckpts/ckpts_-001 --threshold 5 \
        --out results/.../occupancy.npz

No reference analog (the reference samples every ray over the global
[min_depth, max_depth]; ray_samplers/ray_sampler.py:389-401 is its only
bounds logic). The CUDA ecosystem's equivalent (NerfAcc-style grids) skips
samples by compaction — dynamic shapes; this formulation keeps shapes
static and TPU-friendly (see ops/occupancy.py docstring).
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from yanerf_tpu.utils.config import Config, DictAction  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--out", required=True, help="output .npz path")
    parser.add_argument("--resolution", type=int, default=128)
    parser.add_argument("--bounds", type=float, nargs=2, default=(-2.0, 2.0),
                        help="lo hi of the probed cube (must contain the scene)")
    parser.add_argument("--threshold", type=float, default=5.0,
                        help="occupancy density cutoff (sigma units)")
    parser.add_argument("--dilate", type=int, default=1,
                        help="binary dilation radius in voxels (safety margin)")
    parser.add_argument("--chunk", type=int, default=65536)
    parser.add_argument("--device", default=None, choices=["tpu", "cpu"])
    parser.add_argument("--cfg_options", nargs="+", action=DictAction)
    args = parser.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from yanerf_tpu.ops.mesh import evaluate_density_grid
    from yanerf_tpu.ops.occupancy import build_occupancy_grid, occupancy_fraction, save_occupancy
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
    occ = build_occupancy_grid(grid, tuple(args.bounds), args.threshold, dilate=args.dilate)
    frac = occupancy_fraction(occ)
    if frac == 0.0:
        raise SystemExit(
            f"no density above threshold {args.threshold} (grid max {grid.max():.3f}) — "
            "lower --threshold or check the checkpoint"
        )
    save_occupancy(args.out, occ, args.threshold)
    print(f"occupied (dilated) voxel fraction: {frac * 100:.2f}% above sigma {args.threshold}")
    print(f"wrote {args.out} ({args.resolution}^3 uint8)")
    print("enable in a config:  ray_sampler: {{ occupancy_grid: {} }}".format(args.out))
    print("or on the CLI:       --cfg_options pipeline.ray_sampler.occupancy_grid='{}'".format(args.out))


if __name__ == "__main__":
    main()
