"""Shared TPU-work deadline guard for queued measurement harnesses.

The driver runs bench.py / dryrun on the real chip at the end of the
round; a measurement arm still training at that point would serialize
against it through the tunnel and corrupt (or time out) the driver
artifacts — the round-3 failure mode. Writing a unix timestamp to
/tmp/r4/tpu_deadline makes every between-arm checkpoint in the queued
harnesses stop starting NEW work once ``now + headroom`` crosses it
(in-flight arms are never killed: a killed TPU process leaves a stale
pool lease).
"""

from __future__ import annotations

import time
from pathlib import Path

DEADLINE_FILE = Path("/tmp/r4/tpu_deadline")


def should_stop(headroom_s: float = 1800.0) -> bool:
    """True when a new arm (costing up to ``headroom_s``) must not start."""
    try:
        deadline = float(DEADLINE_FILE.read_text().strip())
    except (OSError, ValueError):
        return False
    return time.time() + headroom_s > deadline
