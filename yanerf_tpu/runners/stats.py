"""Stat aggregation helpers (reference runners/utils.py:270-283)."""

from __future__ import annotations

from typing import Dict, Iterable

import numpy as np

from yanerf_tpu.ops.metrics import mse2psnr


def create_stats(preds: Dict, prefixes: Iterable[str] = ("loss_", "objective")) -> Dict[str, float]:
    """Mean every loss_/objective key to a float; derive *_psnr from *_mse."""
    stats: Dict[str, float] = {}
    for key, value in preds.items():
        if any(key.startswith(prefix) for prefix in prefixes):
            stats[key] = float(np.mean(np.asarray(value)))
            if "mse" in key:
                stats["psnr".join(key.split("mse"))] = mse2psnr(stats[key])
    return stats
