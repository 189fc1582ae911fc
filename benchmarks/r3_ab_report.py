"""Reduce results/ab_r3.json to the defaults-verdict table (VERDICT r2 #3).

For each shipped default, compares the arm means against the measured
cross-seed spread and states whether the delta clears it. Writes
results/ab_r3_summary.md and prints it.

Run after (or during) benchmarks/r3_ab_queue.py:
    python benchmarks/r3_ab_report.py
"""

from __future__ import annotations

import json
import os
from pathlib import Path

REPO = Path(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
IN_JSON = REPO / "results" / "ab_r3.json"
OUT_MD = REPO / "results" / "ab_r3_summary.md"

COMPARISONS = [
    ("two_level", "one_level", "two proposal levels (shipped) vs one"),
    ("two_level", "classic_exact", "proposal estimator (shipped) vs classic 64+192"),
    ("classic_exact", "classic_approx", "exact sampler (default) vs approx top-k"),
    ("two_level", "two_level_final32", "48 final training pts (shipped) vs 32"),
    ("two_level", "two_level_repl", "top-k sampler (default) vs replacement sampling"),
    ("distortion_w001", "distortion_w0", "distortion 0.01 vs 0 on sparse-view floater regime"),
    ("two_level_40k", "classic_exact", "proposal 40k (matched ~wall) vs classic 64+192 20k"),
    ("mip_classic", "classic_exact", "mip-NeRF IPE vs point PE on the classic schedule"),
    ("floater_w001", "floater_w0", "distortion 0.01 vs 0, white-bg 24-view floater regime"),
]


def main():
    record = json.loads(IN_JSON.read_text())
    summary = record.get("summary", {})
    lines = [
        "# Multi-seed A/B verdicts (round 3)",
        "",
        f"Scene: `{record['scene']}` (32 test frames; sparse-view regime for the",
        "distortion arms: 12 training views). Seeds per arm in the n column.",
        "",
        "## Per-arm test PSNR",
        "",
        "| arm | n | mean | min | max | spread |",
        "|---|---|---|---|---|---|",
    ]
    for arm, s in sorted(summary.items()):
        lines.append(
            f"| {arm} | {s['n']} | {s['mean_psnr']:.2f} | {s['min']:.2f} | {s['max']:.2f} | {s['spread']:.2f} |"
        )
    lines += ["", "## Comparisons vs measured spread", "",
              "| comparison | delta (dB) | max spread | clears spread? |", "|---|---|---|---|"]
    for a, b, desc in COMPARISONS:
        if a not in summary or b not in summary:
            lines.append(f"| {desc} | — | — | (arms incomplete) |")
            continue
        delta = summary[a]["mean_psnr"] - summary[b]["mean_psnr"]
        spread = max(summary[a]["spread"], summary[b]["spread"])
        verdict = "YES" if abs(delta) > spread else ("within noise" if abs(delta) <= spread else "?")
        lines.append(f"| {desc} | {delta:+.2f} | {spread:.2f} | {verdict} |")
    lines.append("")
    text = "\n".join(lines)
    OUT_MD.write_text(text)
    print(text)


if __name__ == "__main__":
    main()
