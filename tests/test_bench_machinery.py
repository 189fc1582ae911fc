"""bench.py / __graft_entry__ driver-robustness contracts (round-3 postmortem).

Round 3 lost ALL its driver-visible numbers: bench.py printed its one JSON
line only after five compile-heavy phases (rc=124 -> ``parsed: null``), and
``dryrun_multichip`` probed ``jax.devices()`` in the parent, attaching to the
tunneled TPU and stalling on the stale pool lease the previous kill left
behind. These tests pin the two fixes:

  * every completed bench phase is followed by a complete, parsable JSON
    line (supersets — a later stall can only cost later fields);
  * a hung phase is fenced by SIGALRM and skipped, not fatal;
  * the dryrun parent process NEVER imports/initializes jax — all real work
    happens in a freshly-exec'd CPU-mesh child.
"""

import json
import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_run_phase_fences_hangs_and_failures(capsys):
    import bench

    results = {}

    def good():
        results["proposal_rays"] = 400_000.0

    def hangs():
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < 30:  # pragma: no branch
            time.sleep(0.05)

    def fails():
        raise RuntimeError("tunnel exploded")

    def enrich():
        results["fused_s"] = 0.0137

    assert bench._run_phase("good", good, 5)
    bench._emit(results)
    assert not bench._run_phase("hangs", hangs, 1)
    bench._emit(results)
    assert not bench._run_phase("fails", fails, 5)
    bench._emit(results)
    assert bench._run_phase("enrich", enrich, 5)
    bench._emit(results)

    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(lines) == 4
    parsed = [json.loads(ln) for ln in lines]  # every line individually valid
    for p in parsed:
        assert p["metric"] == "proposal_train_rays_per_sec_per_chip"
        assert p["value"] == 400000.0
        assert "vs_baseline" in p
    # later lines are supersets of earlier ones
    assert "fused_wall_ms_per_iter" not in parsed[0]
    assert parsed[-1]["fused_wall_ms_per_iter"] == 13.7
    assert parsed[-1]["time_to_35psnr_class_min"] == pytest.approx(13.7 / 1e3 * 20000 / 60, rel=1e-3)
    assert set(parsed[0]) <= set(parsed[-1])


def test_emit_falls_back_to_classic_headline(capsys):
    import bench

    bench._emit({})  # nothing measured -> nothing printed
    bench._emit({"classic_rays": 69_300.0, "fps_full": 1.44})
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(lines) == 1
    p = json.loads(lines[0])
    assert p["metric"] == "classic_train_rays_per_sec_per_chip"
    assert p["value"] == 69300.0
    assert p["eval_fps_800px_full_budget"] == 1.44


@pytest.mark.slow
def test_dryrun_parent_never_imports_jax(dryrun_multichip_proc):
    """The parent decides from env vars alone; a poisoned ``jax`` module in
    the parent must be harmless because only the re-exec'd child (a fresh
    interpreter with clean sys.modules) touches jax. Asserts on the SHARED
    session dryrun run (tests/conftest.py), whose parent jax module IS
    poisoned — one subprocess serves this and test_graft_entry's
    bootstrap check."""
    proc = dryrun_multichip_proc
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip OK" in proc.stdout
    assert "parent touched jax." not in proc.stdout + proc.stderr
