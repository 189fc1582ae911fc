"""Distortion-loss positive control: floater metrics on the sparse-view arms.

VERDICT r2 #5: the distortion loss (mip-NeRF 360 eq. 15) shipped with only
negative evidence (a clean 100-view scene where it costs PSNR because there
is nothing to suppress). The A/B queue (benchmarks/r3_ab_queue.py) trains
w=0 vs w=0.01 arms on the floater-prone regime — 12 training views of
data/synth800_sparse — but frame-mean PSNR is a blunt probe: floaters are
sparse opacity blobs hanging in free space, diluted over 640k pixels.

This script measures them directly. The procedural GT has an exactly-black
background (scripts/make_synth_scene.py shades every hit with ambient
>= 0.03, so a pixel is background iff its PNG is 0), giving a perfect
per-pixel background mask. On each trained arm checkpoint it renders the
32 test views and reports, over GT-background pixels only:

  * bg_alpha_mean   — mean rendered opacity (floater mass seen by rays)
  * bg_floater_frac — fraction of bg pixels with opacity > 0.1 (blob area)
  * bg_mse          — color error on bg pixels (what PSNR dilutes away)
plus the frame PSNR for cross-checking against results/ab_r3.json.

Writes results/distortion_floaters.json with per-seed rows and per-arm
means. Run AFTER the A/B queue finishes (never share the TPU tunnel):
    nohup python -u benchmarks/r3_distortion_floaters.py > /tmp/floaters.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import re
import sys
from pathlib import Path

import numpy as np

REPO = Path(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, str(REPO))
WORK = REPO / "results" / "nerf" / "ab_r3"
OUT_JSON = REPO / "results" / "distortion_floaters.json"
DATA_DIR = REPO / "data" / "synth800_sparse"


def latest_ckpt(run_dir: Path) -> Path | None:
    """The checkpoint the arm's test PSNR was measured on (last epoch —
    eval_last_epoch_model defaults true), i.e. the highest-numbered dir."""
    versions = sorted(run_dir.glob("version_*"))
    if not versions:
        return None
    cands = []
    for p in (versions[-1] / "ckpts").glob("ckpts_*"):
        m = re.match(r"ckpts_(-?\d+)$", p.name)
        if m and int(m.group(1)) >= 0:
            cands.append((int(m.group(1)), p))
    return max(cands)[1] if cands else None


def load_test_frames():
    import imageio.v2 as imageio

    meta = json.loads((DATA_DIR / "transforms_test.json").read_text())
    calib = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    poses, focals, images = [], [], []
    for fr in meta["frames"]:
        pose = np.asarray(fr["transform_matrix"], dtype=np.float32) @ calib
        img = imageio.imread(DATA_DIR / (fr["file_path"].lstrip("./") + ".png"))
        images.append(img.astype(np.float32) / 255.0)
        poses.append(pose[:3, :4])
        hw = img.shape[0]
        focals.append([0.5 * hw / np.tan(0.5 * meta["camera_angle_x"])])
    return (
        np.stack(poses),
        np.asarray(focals, dtype=np.float32),
        np.stack(images),
    )


def eval_arm(cfg_path: Path, ckpt: Path, poses, focals, images) -> dict:
    import jax
    import jax.numpy as jnp

    from yanerf_tpu.ops.structures import EvaluationMode
    from yanerf_tpu.pipelines import PIPELINES
    from yanerf_tpu.runners import load_checkpoint
    from yanerf_tpu.utils.config import Config

    cfg = Config.fromfile(str(cfg_path))
    pipeline = PIPELINES.build(cfg.pipeline)
    restored = load_checkpoint(ckpt)
    params = jax.tree_util.tree_map(jnp.asarray, restored["restored"]["params"])

    @jax.jit
    def render(params, rng, pose, focal):
        preds = pipeline.forward(
            params, rng, poses=pose[None], focal_lengths=focal[None],
            evaluation_mode=EvaluationMode.EVALUATION,
        )
        return preds["rendered_images"], preds["rendered_alpha_masks"]

    rng = jax.random.PRNGKey(0)
    rows = []
    for i in range(len(poses)):
        rgb, alpha = render(params, jax.random.fold_in(rng, i), jnp.asarray(poses[i]), jnp.asarray(focals[i]))
        rgb = np.asarray(rgb, dtype=np.float32)[0]  # value fetch = tunnel-safe sync
        alpha = np.asarray(alpha, dtype=np.float32)[0, ..., 0]
        gt = images[i]
        bg = np.all(gt == 0.0, axis=-1)  # exact: procedural GT background is 0
        mse = float(np.mean((rgb - gt) ** 2))
        rows.append(
            dict(
                psnr=float(-10.0 * np.log10(max(mse, 1e-12))),
                bg_alpha_mean=float(alpha[bg].mean()),
                bg_floater_frac=float((alpha[bg] > 0.1).mean()),
                bg_mse=float(np.mean((rgb[bg] - gt[bg]) ** 2)),
                bg_pixel_frac=float(bg.mean()),
            )
        )
    agg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    agg["n_frames"] = len(rows)
    return agg


def main():
    poses, focals, images = load_test_frames()
    record = {"scene": str(DATA_DIR.relative_to(REPO)), "runs": {}, "note": (
        "bg_* metrics over exactly-black GT background pixels; floaters are "
        "opacity on rays that should see nothing"
    )}
    if OUT_JSON.exists():
        record = json.loads(OUT_JSON.read_text())
    for run_dir in sorted(WORK.glob("distortion_*_s*")):
        key = run_dir.name
        if key in record["runs"]:
            print(f"SKIP {key} (done)", flush=True)
            continue
        ckpt = latest_ckpt(run_dir)
        if ckpt is None:
            print(f"SKIP {key}: no checkpoint", flush=True)
            continue
        print(f"EVAL {key}: {ckpt}", flush=True)
        agg = eval_arm(run_dir / "arm_config.yml", ckpt, poses, focals, images)
        agg["arm"] = key.rsplit("_s", 1)[0]
        record["runs"][key] = agg
        # per-arm means
        by_arm: dict = {}
        for r in record["runs"].values():
            by_arm.setdefault(r["arm"], []).append(r)
        record["summary"] = {
            arm: {
                "n": len(rs),
                **{
                    m: round(float(np.mean([r[m] for r in rs])), 5)
                    for m in ("psnr", "bg_alpha_mean", "bg_floater_frac", "bg_mse")
                },
            }
            for arm, rs in by_arm.items()
        }
        OUT_JSON.write_text(json.dumps(record, indent=2) + "\n")
        print(f"DONE {key}: {json.dumps(agg)}", flush=True)
    print("ALL DONE " + json.dumps(record.get("summary", {})), flush=True)


if __name__ == "__main__":
    main()
