"""Generate a procedural LLFF-format forward-facing scene.

Ray-traces the same Lambertian sphere arrangement as
``scripts/make_synth_scene.py`` from a cluster of forward-facing cameras and
writes ``images/`` + ``poses_bounds.npy`` in the exact on-disk layout
``LLFFDataset`` consumes (ref yanerf/dataset/llff_dataset.py:161 — per-image
3x5 [R|t|hwf] matrices in LLFF's [down, right, back] column order plus
near/far metric bounds). Fills the evidence gap for the LLFF + NDC training
paths in an environment where the real fern capture cannot be downloaded.

Storage convention (inverse of the loader's axis shuffle at
yanerf_tpu/datasets/llff.py:170): with an OpenGL camera-to-world whose
columns are [right, up, back], the stored columns are
[-up, right, back | position | (h, w, focal)].

Usage:
    python scripts/make_synth_llff.py --out_dir data/synth_llff
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from make_synth_scene import look_at_blender, make_scene  # noqa: E402


def render_hw(c2w_blender, h, w, focal, centers, radii, albedos):
    """Non-square variant of make_synth_scene.render (same conventions)."""
    calib = np.diag([1.0, -1.0, -1.0, 1.0])
    pose = c2w_blender @ calib
    rot, origin = pose[:3, :3], pose[:3, 3]

    ys, xs = np.meshgrid(np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64), indexing="ij")
    dirs_cam = np.stack([(xs - w * 0.5) / focal, (ys - h * 0.5) / focal, np.ones_like(xs)], axis=-1)
    dirs = dirs_cam @ rot.T
    dnorm = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)

    t_best = np.full((h, w), np.inf)
    color = np.zeros((h, w, 3))
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
        shade = np.full((h, w), 0.12)
        for ldir, lw in lights:
            shade = shade + lw * np.maximum(np.einsum("hwc,c->hw", normal, ldir), 0.0)
        contrib = np.clip(shade[..., None] * a, 0.0, 1.0)
        color = np.where(valid[..., None], contrib, color)
        t_best = np.where(valid, t, t_best)
    return color


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--height", type=int, default=378)
    ap.add_argument("--width", type=int, default=504)
    ap.add_argument("--n_images", type=int, default=40)
    ap.add_argument("--n_spheres", type=int, default=6)
    ap.add_argument("--mode", choices=["forward", "orbit"], default="forward",
                    help="forward: LLFF forward-facing cluster; orbit: 360 capture for the spherify path")
    ap.add_argument("--distant_spheres", type=int, default=0,
                    help="add N large background spheres (an UNBOUNDED scene "
                    "for the contract_coords + sample_in_disparity path)")
    ap.add_argument("--distant_min", type=float, default=15.0)
    ap.add_argument("--distant_max", type=float, default=40.0)
    ap.add_argument("--distance", type=float, default=4.0, help="camera plane distance")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from PIL import Image

    out = Path(args.out_dir)
    (out / "images").mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    centers, radii, albedos = make_scene(rng, args.n_spheres)
    if args.distant_spheres:
        far_c, far_r, far_a = [], [], []
        for k in range(args.distant_spheres):
            u = 2 * np.pi * (k + 0.35) / args.distant_spheres
            dist = rng.uniform(args.distant_min, args.distant_max)
            elev = np.deg2rad(rng.uniform(-10.0, 25.0))
            far_c.append(dist * np.array([np.cos(u) * np.cos(elev), np.sin(u) * np.cos(elev), np.sin(elev)]))
            far_r.append(dist * rng.uniform(0.1, 0.2))  # roughly constant angular size
            far_a.append(rng.uniform(0.3, 1.0, size=3))
        centers = np.concatenate([centers, np.asarray(far_c)])
        radii = np.concatenate([radii, np.asarray(far_r)])
        albedos = np.concatenate([albedos, np.asarray(far_a)])

    camera_angle_x = 0.6911112070083618
    focal = 0.5 * args.width / np.tan(0.5 * camera_angle_x)
    scene_center = np.array([0.0, 0.0, 0.3])

    rows = []
    for i in range(args.n_images):
        if args.mode == "orbit":
            # 360 capture: cameras around the scene at mild elevations
            # (spherify=True in the loader re-orients about the central point)
            u = 2 * np.pi * i / args.n_images + rng.uniform(-0.05, 0.05)
            elev = np.deg2rad(rng.uniform(5.0, 35.0))
            r = args.distance + rng.uniform(-0.25, 0.25)
            position = scene_center + r * np.array(
                [np.cos(u) * np.cos(elev), np.sin(u) * np.cos(elev), np.sin(elev)]
            )
            target = scene_center + np.r_[rng.uniform(-0.1, 0.1, size=2), rng.uniform(-0.1, 0.1)]
        else:
            # forward-facing cluster viewing along +y (keeps the look-at basis
            # non-degenerate w.r.t. the global z-up), small lateral/depth jitter
            offset = rng.uniform(-0.6, 0.6, size=2)
            depth = args.distance + rng.uniform(-0.25, 0.25)
            position = np.array([offset[0], -depth, scene_center[2] + offset[1] * 0.5])
            target = scene_center + np.r_[rng.uniform(-0.1, 0.1), 0.0, rng.uniform(-0.1, 0.1)]
        c2w = look_at_blender(position, target)

        img = render_hw(c2w, args.height, args.width, focal, centers, radii, albedos)
        Image.fromarray((img * 255).astype(np.uint8)).save(out / "images" / f"image{i:03d}.png")

        # per-image metric bounds from sphere geometry along the view axis
        forward = -c2w[:3, 2]
        t_centers = (centers - position) @ forward
        near = max(0.5, float((t_centers - radii).min()) * 0.9)
        far = float((t_centers + radii).max()) * 1.2
        if args.distant_spheres:
            # near bound tracks only the CENTRAL content (distant spheres can
            # sit behind the camera on the far side of the orbit)
            t_near_candidates = t_centers[: args.n_spheres] - radii[: args.n_spheres]
            near = max(0.5, float(t_near_candidates.min()) * 0.9)

        right, up, back = c2w[:3, 0], c2w[:3, 1], c2w[:3, 2]
        stored_rot = np.stack([-up, right, back], axis=1)  # columns [down, right, back]
        hwf = np.array([args.height, args.width, focal])
        mat35 = np.concatenate([stored_rot, position[:, None], hwf[:, None]], axis=1)  # (3, 5)
        rows.append(np.concatenate([mat35.reshape(-1), [near, far]]))

    np.save(out / "poses_bounds.npy", np.asarray(rows))
    print(f"LLFF scene written to {out}: {args.n_images} images @ {args.width}x{args.height}, "
          f"bounds ~[{rows[0][-2]:.2f}, {rows[0][-1]:.2f}]")


if __name__ == "__main__":
    main()
