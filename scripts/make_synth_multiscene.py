"""Generate K procedural Blender-format scenes for latent-conditioned training.

Each scene is an independent draw of scripts/make_synth_scene.py's sphere
arrangement (different layouts/albedos per seed), written to
``out_dir/scene_{k}/`` in the exact single-scene layout, so each subdir is
also loadable by the plain ``BlenderDataset``. ``MultiSceneBlenderDataset``
concatenates them with a per-item ``scene_id`` — the conditioning input the
``LearnedSceneEmbedding`` feature extractor maps to ``global_codes``
(BASELINE.json configs[4], the pixelNeRF-style stretch goal; conditioning
contract per ref models/nerf_mlp.py:160-183).

Usage:
    python scripts/make_synth_multiscene.py --out_dir data/synth_multiscene \
        --n_scenes 4 --hw 128 --n_train 30 --n_val 4 --n_test 4
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
from make_synth_scene import CAMERA_ANGLE_X, look_at_blender, make_scene, render  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--n_scenes", type=int, default=4)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--n_train", type=int, default=30)
    ap.add_argument("--n_val", type=int, default=4)
    ap.add_argument("--n_test", type=int, default=4)
    ap.add_argument("--n_spheres", type=int, default=5)
    ap.add_argument("--radius", type=float, default=4.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--bg", type=float, default=0.9,
        help="background intensity. Bright by default: on a mostly-black "
        "scene 'predict background everywhere' is a strong local minimum "
        "that conditioned AND unconditioned models fall into identically "
        "(measured 14.1 dB both), so the latent A/B needs collapse to be "
        "costly",
    )
    args = ap.parse_args()

    from PIL import Image

    focal = 0.5 * args.hw / np.tan(0.5 * CAMERA_ANGLE_X)
    for k in range(args.n_scenes):
        out = Path(args.out_dir) / f"scene_{k}"
        out.mkdir(parents=True, exist_ok=True)
        scene_rng = np.random.RandomState(args.seed * 1000 + k)
        centers, radii, albedos = make_scene(scene_rng, args.n_spheres)
        # shared camera stream across scenes (viewpoint distribution is not a
        # scene-identity cue; only content differs)
        cam_rng = np.random.RandomState(args.seed + 777)
        for split, count in (("train", args.n_train), ("val", args.n_val), ("test", args.n_test)):
            frames = []
            for i in range(count):
                u = cam_rng.uniform(0, 2 * np.pi)
                elev = cam_rng.uniform(np.deg2rad(15), np.deg2rad(70))
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
        print(f"scene_{k}: {args.n_train}/{args.n_val}/{args.n_test} frames @ {args.hw}px")
    print(f"multi-scene dataset written to {args.out_dir}")


if __name__ == "__main__":
    main()
