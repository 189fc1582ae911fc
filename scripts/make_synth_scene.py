"""Generate a procedural NeRF-synthetic (Blender-format) scene.

Ray-traces a small arrangement of Lambertian spheres (plus a ground disc)
from cameras on the upper viewing hemisphere and writes
``transforms_{train,val,test}.json`` + PNGs in the exact layout
``BlenderDataset`` consumes (ref yanerf/dataset/blender_dataset.py:25-78).

The GT renderer reuses this repo's own ray convention (the loader's
z/y-flip calibration and pinhole unprojection from ops/rays.py), so the
generated images are geometrically consistent with training by
construction. Used for convergence validation and benchmarking in an
environment where the published datasets cannot be downloaded.

Usage:
    python scripts/make_synth_scene.py --out_dir /tmp/synth800 --hw 800 \
        --n_train 100 --n_val 8 --n_test 8
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

CAMERA_ANGLE_X = 0.6911112070083618  # the lego intrinsic


def look_at_blender(position: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Camera-to-world in Blender/OpenGL convention (-z forward, y up)."""
    forward = target - position
    forward = forward / np.linalg.norm(forward)
    z_axis = -forward
    up = np.array([0.0, 0.0, 1.0])
    x_axis = np.cross(up, z_axis)
    n = np.linalg.norm(x_axis)
    if n < 1e-6:  # looking straight down the up axis
        x_axis = np.array([1.0, 0.0, 0.0])
    else:
        x_axis = x_axis / n
    y_axis = np.cross(z_axis, x_axis)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x_axis, y_axis, z_axis, position
    return c2w


def make_scene(rng: np.random.RandomState, n_spheres: int = 6):
    """Random shaded spheres inside the unit-ish ball (lego-scale scene)."""
    centers, radii, albedos = [], [], []
    for _ in range(n_spheres):
        centers.append(rng.uniform(-0.8, 0.8, size=3) * np.array([1.0, 1.0, 0.6]) + np.array([0, 0, 0.3]))
        radii.append(rng.uniform(0.18, 0.45))
        albedos.append(rng.uniform(0.25, 1.0, size=3))
    return np.asarray(centers), np.asarray(radii), np.asarray(albedos)


def render(
    c2w_blender: np.ndarray,
    hw: int,
    focal: float,
    centers: np.ndarray,
    radii: np.ndarray,
    albedos: np.ndarray,
    bg: float = 0.0,
) -> np.ndarray:
    """Trace primary rays against the spheres; two-light Lambertian shading."""
    # The loader right-multiplies by diag(1,-1,-1,1); reproduce it so GT rays
    # match what the pipeline will cast at train time.
    calib = np.diag([1.0, -1.0, -1.0, 1.0])
    pose = c2w_blender @ calib
    rot, origin = pose[:3, :3], pose[:3, 3]

    ys, xs = np.meshgrid(np.arange(hw, dtype=np.float64), np.arange(hw, dtype=np.float64), indexing="ij")
    dirs_cam = np.stack([(xs - hw * 0.5) / focal, (ys - hw * 0.5) / focal, np.ones_like(xs)], axis=-1)
    dirs = dirs_cam @ rot.T  # (H, W, 3), unnormalized (matches ops/rays.py)
    dnorm = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)

    t_best = np.full((hw, hw), np.inf)
    color = np.full((hw, hw, 3), bg)
    lights = [
        (np.array([0.4, 0.3, 0.85]) / np.linalg.norm([0.4, 0.3, 0.85]), 0.9),
        (np.array([-0.6, -0.2, 0.5]) / np.linalg.norm([-0.6, -0.2, 0.5]), 0.45),
    ]
    for c, r, a in zip(centers, radii, albedos):
        oc = origin - c
        b = np.sum(dnorm * oc, axis=-1)
        disc = b * b - (np.dot(oc, oc) - r * r)
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0.0))
        valid = hit & (t > 1e-3) & (t < t_best)
        p = origin + t[..., None] * dnorm
        normal = (p - c) / r
        shade = np.full((hw, hw), 0.12)  # ambient
        for ldir, lw in lights:
            shade = shade + lw * np.maximum(np.einsum("hwc,c->hw", normal, ldir), 0.0)
        contrib = np.clip(shade[..., None] * a, 0.0, 1.0)
        color = np.where(valid[..., None], contrib, color)
        t_best = np.where(valid, t, t_best)
    return color


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--hw", type=int, default=800)
    ap.add_argument("--n_train", type=int, default=100)
    ap.add_argument("--n_val", type=int, default=8)
    ap.add_argument("--n_test", type=int, default=8)
    ap.add_argument("--n_spheres", type=int, default=6)
    ap.add_argument("--radius", type=float, default=4.0, help="camera orbit radius")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--bg", type=float, default=0.0,
        help="background intensity (1.0 = white; a non-black bg makes density "
        "fog COST rgb loss, the well-posed regime for floater/regularizer A/Bs)",
    )
    args = ap.parse_args()

    from PIL import Image

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    centers, radii, albedos = make_scene(rng, args.n_spheres)
    focal = 0.5 * args.hw / np.tan(0.5 * CAMERA_ANGLE_X)

    splits = [("train", args.n_train), ("val", args.n_val), ("test", args.n_test)]
    for split, count in splits:
        frames = []
        for i in range(count):
            # deterministic, split-disjoint viewpoints on the upper hemisphere
            u = rng.uniform(0, 2 * np.pi)
            elev = rng.uniform(np.deg2rad(15), np.deg2rad(70))
            position = args.radius * np.array(
                [np.cos(u) * np.cos(elev), np.sin(u) * np.cos(elev), np.sin(elev)]
            )
            c2w = look_at_blender(position, np.array([0.0, 0.0, 0.3]))
            img = render(c2w, args.hw, focal, centers, radii, albedos, bg=args.bg)
            name = f"r_{split}_{i}"
            Image.fromarray((img * 255).astype(np.uint8)).save(out / f"{name}.png")
            frames.append({"file_path": f"./{name}", "transform_matrix": c2w.tolist()})
        (out / f"transforms_{split}.json").write_text(
            json.dumps({"camera_angle_x": CAMERA_ANGLE_X, "frames": frames})
        )
        print(f"{split}: {count} frames @ {args.hw}x{args.hw}")
    print(f"scene written to {out}")


if __name__ == "__main__":
    main()
