"""Preemption-safe training: SIGTERM mid-run must produce a clean exit with
a resumable emergency checkpoint, and resuming must continue training.

The reference has no fault tolerance at all (SURVEY §5); this is the one
aux axis where the TPU build exceeds it.
"""

import json
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tests"))

from test_cli import CFG_TEMPLATE, _make_blender  # noqa: E402


@pytest.mark.slow
def test_sigterm_saves_resumable_checkpoint(tmp_path):
    data_dir = tmp_path / "data"
    _make_blender(data_dir)
    output_root = tmp_path / "results"
    cfg = CFG_TEMPLATE.format(data_dir=data_dir, output_dir=output_root)
    # long run so the kill lands mid-training; log every iter
    cfg = cfg.replace("num_iters: 8", "num_iters: 4000").replace("print_per_iter: 4", "print_per_iter: 1")
    cfg_path = tmp_path / "tiny.yml"
    cfg_path.write_text(cfg)

    proc = subprocess.Popen(
        [sys.executable, "scripts/run.py", "--config", str(cfg_path), "--device", "cpu"],
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    out_dir = output_root / "version_0"
    log = out_dir / "run.log"
    deadline = time.time() + 480  # generous: parallel suites can steal the CPUs during startup compile
    while time.time() < deadline:
        if log.exists() and "iter: 2" in log.read_text():
            break
        time.sleep(0.5)
    else:
        proc.kill()
        pytest.fail("training never reached iter 2")

    proc.send_signal(signal.SIGTERM)
    stdout, _ = proc.communicate(timeout=480)
    assert proc.returncode == 0, f"expected clean exit, got {proc.returncode}:\n{stdout[-4000:]}"

    log_text = log.read_text()
    assert "preemption requested" in log_text
    assert "saved emergency checkpoint" in log_text
    assert "skipping final test" in log_text
    ckpt = out_dir / "ckpts" / "ckpts_preempt"
    assert ckpt.is_dir(), sorted((out_dir / "ckpts").glob("*"))

    # Resume from the emergency checkpoint with a short remaining schedule.
    cfg2 = CFG_TEMPLATE.format(data_dir=data_dir, output_dir=output_root)
    cfg2_path = tmp_path / "resume.yml"
    cfg2_path.write_text(cfg2)
    result = subprocess.run(
        [
            sys.executable, "scripts/run.py",
            "--config", str(cfg2_path),
            "--device", "cpu",
            "--checkpoint", str(ckpt),
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert result.returncode == 0, result.stdout[-2000:] + result.stderr[-4000:]
    resume_dir = output_root / "version_1"
    resume_log = (resume_dir / "run.log").read_text()
    assert "Resumed checkpoint from" in resume_log
    # full contract after resume: training ran and the final test produced stats
    stats = json.loads((resume_dir / "test_stats.json").read_text().splitlines()[-1])
    assert "test_loss_rgb_psnr" in stats
