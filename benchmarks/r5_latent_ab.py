"""Latent multi-scene A/B on the chip (VERDICT r4 weak #5).

Trains configs/nerf/synth_multiscene_latent.yml (4 scenes, one NeRFMLP +
16-dim trainable per-scene codes) and its unconditioned control through the
FULL CLI, and records both test PSNRs to results/latent_multiscene.json.
The capability claim is the measured gap: the unconditioned model must
average the scenes; the conditioned one fits them jointly.

Run: nohup python -u benchmarks/r5_latent_ab.py > /tmp/r5_latent.log 2>&1 &
(generate data first: scripts/make_synth_multiscene.py --out_dir
 data/synth_multiscene --n_scenes 4 --hw 128 --n_train 30 --n_val 4 --n_test 4)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
OUT_JSON = REPO / "results" / "latent_multiscene.json"


def run_arm(config: str, out_dir: Path) -> dict:
    cmd = [
        sys.executable, "-u", "scripts/run.py", "--config", config,
        "--cfg_options", f"runner.output_dir={out_dir}",
    ]
    print(f"[latent_ab] {' '.join(cmd)}", flush=True)
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, cwd=REPO, stdout=sys.stdout, stderr=subprocess.STDOUT, timeout=2400)
    wall = time.perf_counter() - t0
    versions = sorted(out_dir.glob("version_*"), key=lambda p: int(p.name.split("_")[1]))
    psnr = ssim = None
    if versions and (versions[-1] / "test_stats.json").exists():
        lines = [json.loads(l) for l in (versions[-1] / "test_stats.json").read_text().splitlines() if l.strip()]
        if lines:
            psnr = lines[-1].get("test_loss_rgb_psnr")
            ssim = lines[-1].get("test_loss_rgb_ssim")
    return {"returncode": proc.returncode, "wall_min": round(wall / 60.0, 2),
            "test_psnr": psnr, "test_ssim": ssim}


def main():
    rec = {
        "what": "latent (global_codes) multi-scene A/B: one model + trainable per-scene codes vs unconditioned, 4 procedural 128px scenes trained jointly, full CLI",
        "configs": ["configs/nerf/synth_multiscene_latent.yml", "configs/nerf/synth_multiscene_unconditioned.yml"],
        "arms": {},
    }
    for label, config in (
        ("latent", "configs/nerf/synth_multiscene_latent.yml"),
        ("unconditioned", "configs/nerf/synth_multiscene_unconditioned.yml"),
    ):
        rec["arms"][label] = run_arm(config, Path(f"/tmp/r5_latent_{label}"))
        OUT_JSON.write_text(json.dumps(rec, indent=2) + "\n")
        print(f"[latent_ab] {label}: {rec['arms'][label]}", flush=True)
    lat, unc = rec["arms"]["latent"].get("test_psnr"), rec["arms"]["unconditioned"].get("test_psnr")
    if lat and unc:
        rec["delta_db"] = round(lat - unc, 2)
        rec["headline"] = (
            f"latent conditioning trains end-to-end: {lat:.2f} vs {unc:.2f} test PSNR "
            f"({rec['delta_db']:+.2f} dB) on 4 jointly-trained scenes"
        )
    OUT_JSON.write_text(json.dumps(rec, indent=2) + "\n")
    print(f"[latent_ab] wrote {OUT_JSON}", flush=True)


if __name__ == "__main__":
    main()
