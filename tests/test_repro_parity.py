"""Parity-runbook smoke test (VERDICT r2 #4).

Runs ``scripts/repro_parity.py --smoke`` end-to-end on procedural
stand-ins: generated Blender-format scene -> reference-layout ``.pth``
written by ``export_torch_checkpoint`` -> imported through ``run.py
--checkpoint *.pth --test_only`` -> stats parsed -> the val-polling +
SIGTERM time-to-quality loop. This certifies the one-command real-data
runbook is known-good before ``data/nerf_synthetic``/``nerf_llff_data``
ever mount.
"""

import json
import os
import os.path as osp
import subprocess
import sys

import pytest

torch = pytest.importorskip("torch")

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.mark.slow
def test_repro_parity_smoke(tmp_path):
    out = tmp_path / "parity_smoke.json"
    env = dict(os.environ)
    # subprocesses must not inherit the 8-device mesh; a single CPU device
    # keeps the tiny runs fast
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    result = subprocess.run(
        [
            sys.executable,
            osp.join(REPO, "scripts", "repro_parity.py"),
            "--smoke",
            "--device", "cpu",
            "--smoke_dir", str(tmp_path / "work"),
            "--smoke_iters", "120",
            "--smoke_target_psnr", "9.0",
            "--out", str(out),
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert result.returncode == 0, f"stdout:\n{result.stdout[-3000:]}\nstderr:\n{result.stderr[-3000:]}"

    record = json.loads(out.read_text())
    assert record["mode"] == "smoke"
    assert record["ok"] is True
    # the .pth import ran through run.py --test_only and produced a PSNR
    assert record["stages"]["test_only_import"]["ok"]
    # the time-to-quality loop observed at least one val point
    ttq = record["stages"]["time_to_quality"]
    assert ttq["best_val_psnr"] is not None


def test_export_import_roundtrip_identity():
    """export_torch_checkpoint -> import_torch_checkpoint is the identity."""
    import jax
    import numpy as np

    from yanerf_tpu.models import MODELS
    from yanerf_tpu.runners import export_torch_checkpoint, import_torch_checkpoint

    model = MODELS.build(
        dict(
            type="NeRFMLP", n_layers=3, input_skips=[2], n_hidden_neurons_xyz=32,
            n_hidden_neurons_dir=16, latent_dim=0, color_dim=3,
        )
    )
    params = {
        "implicit_functions": [model.init(jax.random.PRNGKey(0)), model.init(jax.random.PRNGKey(1))],
        "feature_extractors": [],
    }
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        pth = osp.join(td, "ckpts_-001.pth")
        n = export_torch_checkpoint(params, pth)
        assert n > 0
        imported, n_missing = import_torch_checkpoint(pth, params)
    assert n_missing == 0

    flat_orig = jax.tree_util.tree_leaves(params)
    flat_imported = jax.tree_util.tree_leaves(imported)
    assert len(flat_orig) == len(flat_imported)
    for a, b in zip(flat_orig, flat_imported):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
