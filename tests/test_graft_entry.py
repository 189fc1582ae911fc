"""The driver's entry points must work in a FRESH interpreter, without the
test harness's virtual-mesh bootstrap (this is exactly what broke in round 1:
``dryrun_multichip`` assumed someone else had created the 8 virtual devices).
"""

import pytest
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, extra_env: dict, timeout: int = 600):
    env = dict(os.environ)
    # Simulate the driver: no virtual mesh pre-configured, one CPU device.
    env.pop("XLA_FLAGS", None)
    env.pop("YANERF_GRAFT_FORCE_CPU", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_entry_traces_in_fresh_interpreter():
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__ as g\n"
        "fn, args = g.entry()\n"
        "out = jax.eval_shape(fn, *args)\n"
        "print('TRACE_OK', out.shape, out.dtype)\n"
    )
    proc = _run(code, {})
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "TRACE_OK" in proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_bootstraps_virtual_mesh(dryrun_multichip_proc):
    """Round-1 regression: no pre-built virtual mesh -> must self-bootstrap 8.

    Asserts on the SHARED session dryrun run (tests/conftest.py): one
    subprocess serves this and test_bench_machinery's parent-isolation
    check — the two used to burn a full ~3-min flagship compile each
    (VERDICT r4 weak #6)."""
    proc = dryrun_multichip_proc
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip OK" in proc.stdout
    assert "'data': 2" in proc.stdout and "'rays': 4" in proc.stdout
