"""Extract a polygon mesh from a trained model's density field.

Evaluates the pipeline's final-pass implicit function on a lattice (chunked
``lax.map`` — one fixed-shape XLA program, runs on TPU or CPU) and runs
surface nets on the host (yanerf_tpu/ops/mesh.py):

    python scripts/extract_mesh.py --config configs/nerf/lego_proposal.yml \
        --checkpoint results/.../ckpts/ckpts_-001 \
        --out lego.obj --resolution 256 --iso 25 --bounds -1.5 1.5

A serving capability with no reference analog (the reference consumes
trained models only via --test_only eval, scripts/run.py:292-321). The iso
value is in activated-density units (sigma); useful surfaces for NeRF-style
models usually sit in the 10-100 range — sweep with --resolution 64 first.
"""

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from yanerf_tpu.utils.config import Config, DictAction  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--out", default="mesh.obj")
    parser.add_argument("--resolution", type=int, default=256)
    parser.add_argument("--iso", type=float, default=25.0)
    parser.add_argument("--bounds", type=float, nargs=2, default=(-1.5, 1.5),
                        help="lo hi of the sampled cube in model coordinates")
    parser.add_argument("--chunk", type=int, default=65536)
    parser.add_argument("--vertex_colors", action="store_true",
                        help="query the color head at each vertex (view = -normal) and write a colored OBJ")
    parser.add_argument("--device", default=None, choices=["tpu", "cpu"],
                        help="force a backend (cpu needed on machines whose sitecustomize pins a device)")
    parser.add_argument("--cfg_options", nargs="+", action=DictAction)
    args = parser.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from yanerf_tpu.ops.mesh import (
        evaluate_density_grid,
        evaluate_vertex_colors,
        save_obj,
        surface_nets,
        vertex_normals,
    )
    from yanerf_tpu.pipelines import PIPELINES

    config = Config.fromfile(args.config)
    if args.cfg_options:
        config.merge_from_dict(args.cfg_options)

    pipeline = PIPELINES.build(config.pipeline)
    params = pipeline.init(jax.random.PRNGKey(config.runner.get("seed", 0)))
    if args.checkpoint:
        # template-free restore: mesh extraction needs only the params tree,
        # so skip reconstructing the optimizer state (whose structure varies
        # with runner options, e.g. flattened Adam)
        from yanerf_tpu.runners import load_checkpoint

        params = load_checkpoint(args.checkpoint)["restored"]["params"]

    # the final pass is the full-quality model (coarse/proposal passes are
    # sampling guides): last in the list for every renderer family
    # (pipelines/renderer.py — multipass recursion tail, proposal main model)
    model = pipeline.implicit_functions[-1]
    model_params = params["implicit_functions"][-1]

    print(f"evaluating density on a {args.resolution}^3 lattice (bounds {args.bounds})...", flush=True)
    grid = evaluate_density_grid(
        model, model_params, resolution=args.resolution, bounds=tuple(args.bounds), chunk=args.chunk
    )
    print(
        f"density: min {grid.min():.3f} max {grid.max():.3f} "
        f"({(grid > args.iso).mean() * 100:.2f}% of lattice above iso {args.iso})",
        flush=True,
    )

    lo, hi = args.bounds
    spacing = (hi - lo) / (args.resolution - 1)
    verts, faces = surface_nets(grid, iso=args.iso, origin=(lo, lo, lo), spacing=(spacing,) * 3)
    if len(verts) == 0:
        print(f"WARNING: iso {args.iso} does not intersect the field — empty mesh written")
    colors = None
    if args.vertex_colors and len(verts):
        print("querying vertex colors (view = -normal)...", flush=True)
        colors = evaluate_vertex_colors(
            model, model_params, verts, vertex_normals(verts, faces), chunk=args.chunk
        )
    save_obj(args.out, verts, faces, colors=colors)
    kind = "colored vertices" if colors is not None else "vertices"
    print(f"wrote {args.out}: {len(verts)} {kind}, {len(faces)} quads")


if __name__ == "__main__":
    main()
