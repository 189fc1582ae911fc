"""Full-schedule A/B: exact vs approximate Gumbel-top-k ray sampling.

Guards the approx sampler's default-on status (ops/sampling.py:47 uses
``lax.approx_max_k`` with recall 0.95): trains the flagship schedule twice
on the procedural 800x800 scene — identical except for
``pipeline.ray_sampler.approx_top_k`` — then reports the val-PSNR curves
side by side. The two curves overlaying (within seed noise) is the
acceptance criterion.

Run detached (TPU sessions must never be killed):
    nohup python benchmarks/sampler_ab.py > /tmp/sampler_ab.log 2>&1 &
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_arm(name: str, approx: bool) -> Path:
    out_root = REPO / "results" / "sampler_ab" / name
    cmd = [
        sys.executable,
        "scripts/run.py",
        "--config", "configs/nerf/synth800.yml",
        "--output_dir", str(out_root),
        "--cfg_options",
        f"pipeline.ray_sampler.approx_top_k={'true' if approx else 'false'}",
    ]
    print(f"=== arm {name}: {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, cwd=REPO, check=True)
    versions = sorted(out_root.glob("version_*"))
    return versions[-1]


def read_curve(version_dir: Path, key: str = "val_loss_rgb_psnr"):
    stats_file = version_dir / "val_stats.json"
    curve = []
    for line in stats_file.read_text().splitlines():
        rec = json.loads(line)
        if key in rec:
            curve.append((rec.get("epoch"), round(rec[key], 3)))
    return curve


def main():
    arms = {}
    for name, approx in (("approx", True), ("exact", False)):
        vdir = run_arm(name, approx)
        arms[name] = {
            "dir": str(vdir),
            "val_psnr_curve": read_curve(vdir),
            "test": json.loads((vdir / "test_stats.json").read_text().splitlines()[-1]),
        }
        print(json.dumps({name: arms[name]}, indent=2), flush=True)

    summary = {
        "approx_curve": arms["approx"]["val_psnr_curve"],
        "exact_curve": arms["exact"]["val_psnr_curve"],
        "approx_test_psnr": arms["approx"]["test"].get("test_loss_rgb_psnr"),
        "exact_test_psnr": arms["exact"]["test"].get("test_loss_rgb_psnr"),
    }
    out = REPO / "results" / "sampler_ab" / "summary.json"
    out.write_text(json.dumps(summary, indent=2))
    print("SUMMARY", json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
