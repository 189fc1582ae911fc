"""Render a camera trajectory from a trained checkpoint.

The serving-side companion to scripts/run.py: loads a config + checkpoint and
renders either the dataset's generated render path (LLFF spiral / spherified
circle) or the test split's cameras, writing PNGs (and reporting fps).

Usage:
  python scripts/render.py --config configs/nerf/lego.yml \
      --checkpoint results/.../ckpts/ckpts_-001 --output_dir renders/
"""

import argparse
import os.path as osp
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from yanerf_tpu.utils.config import Config, DictAction  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output_dir", default="renders")
    parser.add_argument("--trajectory", choices=["render_path", "test"], default="render_path")
    parser.add_argument("--n_frames", type=int, default=None)
    parser.add_argument("--device", default="tpu", choices=["tpu", "cuda", "cpu"])
    parser.add_argument("--gif", action="store_true", help="also write rgb.gif (PIL, no ffmpeg needed)")
    parser.add_argument("--gif_fps", type=float, default=15.0)
    parser.add_argument("--cfg_options", nargs="+", action=DictAction)
    args = parser.parse_args()

    cfg = Config.fromfile(args.config)
    if args.cfg_options is not None:
        cfg.merge_from_dict(args.cfg_options)

    import jax
    import jax.numpy as jnp

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from yanerf_tpu.datasets import DATASETS
    from yanerf_tpu.ops.structures import EvaluationMode
    from yanerf_tpu.pipelines import PIPELINES
    from yanerf_tpu.runners import load_checkpoint, to_img
    from yanerf_tpu.runners.checkpoints import import_torch_checkpoint
    from yanerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    pipeline = PIPELINES.build(cfg.pipeline)
    params = pipeline.init(jax.random.PRNGKey(0))
    if str(args.checkpoint).endswith(".pth"):
        params, n_missing = import_torch_checkpoint(args.checkpoint, params)
        print(f"imported torch checkpoint ({n_missing} unmapped tensors)")
    else:
        restored = load_checkpoint(args.checkpoint)
        params = jax.tree_util.tree_map(jnp.asarray, restored["restored"]["params"])

    # trajectory cameras
    test_ds = DATASETS.build(cfg.datasets[-1])
    if args.trajectory == "render_path" and hasattr(test_ds, "render_poses"):
        from yanerf_tpu.datasets.blender import CAM_CALIBRATION

        raw = test_ds.render_poses  # (N, 3, 5) pose|hwf
        poses = np.asarray([p[:, :4] @ CAM_CALIBRATION for p in raw], dtype=np.float32)
        focals = np.asarray([[p[2, 4]] for p in raw], dtype=np.float32)
        bounds = [(None, None)] * len(poses)
        if hasattr(test_ds, "bds"):
            lo, hi = float(test_ds.bds.min()), float(test_ds.bds.max())
            bounds = [(lo, hi)] * len(poses)
    else:
        if args.trajectory == "render_path":
            # an explicit render_path request must not silently degrade —
            # test frames look plausible enough to be mistaken for the path
            print(
                f"WARNING: {type(test_ds).__name__} has no render_poses "
                "(LLFF spiral/spherify paths only); falling back to the "
                "test split's cameras",
                flush=True,
            )
        items = [test_ds[i] for i in range(len(test_ds))]
        poses = np.stack([it[0][:3, :4] if it[0].shape[0] == 4 else it[0] for it in items])
        focals = np.stack([it[1] for it in items])
        bounds = [
            (float(it[3][0]), float(it[4][0])) if len(it) >= 5 else (None, None) for it in items
        ]

    if args.n_frames:
        poses, focals, bounds = poses[: args.n_frames], focals[: args.n_frames], bounds[: args.n_frames]

    @jax.jit
    def render(params, rng, pose, focal, min_depth, max_depth):
        preds = pipeline.forward(
            params, rng,
            poses=pose[None], focal_lengths=focal[None],
            min_depth=min_depth, max_depth=max_depth,
            evaluation_mode=EvaluationMode.EVALUATION,
        )
        return preds["rendered_images"], preds["rendered_depths"]

    out_dir = Path(args.output_dir)
    (out_dir / "rgb").mkdir(parents=True, exist_ok=True)
    (out_dir / "depth").mkdir(parents=True, exist_ok=True)

    import imageio

    rng = jax.random.PRNGKey(0)
    gif_frames = []
    t_start = time.perf_counter()
    for i, (pose, focal, (lo, hi)) in enumerate(zip(poses, focals, bounds)):
        frame, depth = render(
            params, jax.random.fold_in(rng, i), jnp.asarray(pose), jnp.asarray(focal),
            None if lo is None else jnp.float32(lo), None if hi is None else jnp.float32(hi),
        )
        rgb = to_img(np.asarray(frame)[0])
        d = np.asarray(depth)[0]
        d = d / max(d.max(), 1e-6)
        imageio.imwrite(out_dir / "rgb" / f"{i:05d}.png", rgb)
        imageio.imwrite(out_dir / "depth" / f"{i:05d}.png", to_img(d))
        if args.gif:
            gif_frames.append(rgb)
        if i == 0:
            t_start = time.perf_counter()  # exclude compile from fps
    n_timed = max(1, len(poses) - 1)
    fps = n_timed / (time.perf_counter() - t_start)
    print(f"rendered {len(poses)} frames to {out_dir} ({fps:.3f} fps after compile)")

    if args.gif and gif_frames:
        from PIL import Image

        ims = [Image.fromarray(f) for f in gif_frames]
        ims[0].save(
            out_dir / "rgb.gif", save_all=True, append_images=ims[1:],
            duration=int(1000 / args.gif_fps), loop=0,
        )
        print(f"wrote {out_dir / 'rgb.gif'} ({len(ims)} frames @ {args.gif_fps:g} fps)")


if __name__ == "__main__":
    main()
