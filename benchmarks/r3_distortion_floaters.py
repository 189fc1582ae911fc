"""Distortion-loss positive control: floater metrics on the reduced-view arms.

VERDICT r2 #5: the distortion loss (mip-NeRF 360 eq. 15) shipped with only
negative evidence (a clean 100-view scene where it costs PSNR because there
is nothing to suppress). The A/B queue (benchmarks/r3_ab_queue.py) trains
w=0 vs w=0.01 arms on reduced-view regimes — frame-mean PSNR is a blunt
probe there: floaters are sparse opacity blobs hanging in free space,
diluted over 640k pixels. Two regimes (see REGIMES):

  * distortion_*: 12 views, black bg — DEGENERATE control (kept for the
    record): both arms fill space with black fog (bg_alpha == 1.0), which
    is free against a black background and not what distortion targets.
  * floater_*: 24 views, WHITE bg — well-posed: fog costs rgb loss, so
    surviving background opacity is actual floaters.

This script measures them directly. The procedural GT writes a constant
background wherever no sphere was hit (ambient shading keeps foreground
off that value), giving a perfect per-pixel background mask. On each
trained arm checkpoint it renders the 32 test views and reports, over
GT-background pixels only:

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

# arm prefix -> (scene dir, background intensity). The 12-view black-bg
# control degenerated into uniform black fog (bg_alpha == 1.0 both arms —
# fog is FREE against a black background); the white-bg 24-view scene is
# the well-posed follow-up: fog costs rgb loss there, so surviving bg
# opacity is actual floaters.
REGIMES = {
    "distortion": (REPO / "data" / "synth800_sparse", 0.0),
    "floater": (REPO / "data" / "synth800_floater", 1.0),
}


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


def load_test_frames(data_dir: Path):
    import imageio.v2 as imageio

    meta = json.loads((data_dir / "transforms_test.json").read_text())
    calib = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    poses, focals, images = [], [], []
    for fr in meta["frames"]:
        pose = np.asarray(fr["transform_matrix"], dtype=np.float32) @ calib
        img = imageio.imread(data_dir / (fr["file_path"].lstrip("./") + ".png"))
        images.append(img.astype(np.float32) / 255.0)
        poses.append(pose[:3, :4])
        hw = img.shape[0]
        focals.append([0.5 * hw / np.tan(0.5 * meta["camera_angle_x"])])
    return (
        np.stack(poses),
        np.asarray(focals, dtype=np.float32),
        np.stack(images),
    )


def eval_arm(cfg_path: Path, ckpt: Path, poses, focals, images, bg_value: float) -> dict:
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
        # exact: the generator writes the constant bg intensity wherever no
        # sphere was hit (ambient shading keeps foreground off that value)
        bg = np.all(gt == bg_value, axis=-1)
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
    record = {"runs": {}, "note": (
        "bg_* metrics over constant-GT-background pixels; floaters are "
        "opacity on rays that should see nothing but background"
    )}
    if OUT_JSON.exists():
        record = json.loads(OUT_JSON.read_text())
    frames_cache = {}
    for prefix, (data_dir, bg_value) in REGIMES.items():
        if not data_dir.is_dir():
            continue
        for run_dir in sorted(WORK.glob(f"{prefix}_*_s*")):
            key = run_dir.name
            if key in record["runs"]:
                print(f"SKIP {key} (done)", flush=True)
                continue
            ckpt = latest_ckpt(run_dir)
            if ckpt is None:
                print(f"SKIP {key}: no checkpoint", flush=True)
                continue
            if prefix not in frames_cache:
                frames_cache[prefix] = load_test_frames(data_dir)
            poses, focals, images = frames_cache[prefix]
            print(f"EVAL {key}: {ckpt}", flush=True)
            agg = eval_arm(run_dir / "arm_config.yml", ckpt, poses, focals, images, bg_value)
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
