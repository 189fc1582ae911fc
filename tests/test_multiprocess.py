"""True multi-process coverage for parallel/distributed.py.

Round 1 exercised the distributed helpers only at world_size=1 (where they
no-op). Here we spawn TWO real processes over the JAX CPU backend —
``jax.distributed.initialize`` via ``init_distributed_mode`` with RANK /
WORLD_SIZE env discovery (the reference's env:// analog, ref
runners/utils.py:216-238) — and run the exact eval-metric recipe the runner
uses: per-batch ``concat_all_gather`` -> concat across batches -> truncate
the sharded-sampler wraparound padding to the dataset length -> mean
(ref apis.py:173-204), plus ``barrier``.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import os
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from yanerf_tpu.parallel.distributed import (
    barrier, concat_all_gather, get_rank, get_world_size, init_distributed_mode,
    is_dist_avail_and_initialized, is_main_process,
)

assert init_distributed_mode(os.environ["COORD_ADDR"]) is True
assert is_dist_avail_and_initialized()
assert get_world_size() == 2
rank = get_rank()
assert rank == int(os.environ["RANK"])
assert is_main_process() == (rank == 0)

# Emulate eval over a 5-sample dataset, world=2, batch=1: the sharded
# sampler pads by wraparound, so rank0 sees samples [0,2,4] and rank1
# sees [1,3,0(pad)]. Losses are sample_idx * 1.0.
my_samples = {0: [0.0, 2.0, 4.0], 1: [1.0, 3.0, 0.0]}[rank]
chunks = []
for value in my_samples:
    chunks.append(concat_all_gather(np.asarray([value], dtype=np.float32)))
    barrier("per-batch")

gathered = np.concatenate(chunks, axis=0)
assert gathered.shape == (6,), gathered.shape
# per-batch gather must interleave ranks in order: [0,1,2,3,4,0]
assert np.allclose(gathered, [0.0, 1.0, 2.0, 3.0, 4.0, 0.0]), gathered
mean = float(np.mean(gathered[:5]))  # truncate wraparound pad, then mean
assert abs(mean - 2.0) < 1e-6, mean
barrier("done")
print(f"MULTIPROC_OK rank={rank} mean={mean}", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_gather_truncate_mean_and_barrier():
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # one CPU device per process is enough
        env.update(
            JAX_PLATFORMS="cpu",
            RANK=str(rank),
            WORLD_SIZE="2",
            COORD_ADDR=f"localhost:{port}",
            PYTHONPATH=str(REPO) + os.pathsep + os.environ.get("PYTHONPATH", ""),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", WORKER],
                env=env,
                cwd=REPO,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = [p.communicate(timeout=300) for p in procs]
    for rank, (proc, (out, err)) in enumerate(zip(procs, outs)):
        assert proc.returncode == 0, f"rank {rank} failed:\n{out}\n{err[-4000:]}"
        assert f"MULTIPROC_OK rank={rank} mean=2.0" in out


SAVE_WORKER = r"""
import os
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax

from yanerf_tpu.parallel.distributed import barrier, get_rank, init_distributed_mode

assert init_distributed_mode(os.environ["COORD_ADDR"]) is True
rank = get_rank()

# import AFTER distributed init: the runners import chain initializes the
# XLA backend, which must happen post-initialize in multi-process mode
from yanerf_tpu.runners import create_train_state, load_checkpoint
from yanerf_tpu.runners.checkpoints import save_checkpoint, wait_for_async_saves

params = {"w": jnp.arange(4.0) + 1.0}
state = create_train_state(params, optax.sgd(1e-2))
# ALL ranks call save (the orbax multi-host contract: its save opens with
# a global process sync — a main-only call deadlocks; this test hangs on
# regression and is killed by the harness timeout)
out_dir = os.environ["OUT_DIR"]
save_checkpoint(out_dir, state, epoch=3)
wait_for_async_saves()
barrier("saved")
# restore has the SAME all-hosts contract as save (orbax syncs globally
# in Checkpointer.restore) — every rank loads, every rank verifies
restored = load_checkpoint(os.path.join(out_dir, "ckpts", "ckpts_0003"))
w = np.asarray(restored["restored"]["params"]["w"])
assert np.allclose(w, [1, 2, 3, 4]), w
barrier("done")
print(f"SAVE_OK rank={rank}", flush=True)
"""


def test_two_process_checkpoint_save_all_ranks(tmp_path):
    """save_checkpoint must complete when called by every rank under a real
    2-process jax.distributed runtime (orbax syncs globally inside save;
    main-only saving deadlocks — the regression this test pins)."""
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update(
            JAX_PLATFORMS="cpu",
            RANK=str(rank),
            WORLD_SIZE="2",
            COORD_ADDR=f"localhost:{port}",
            OUT_DIR=str(tmp_path),
            PYTHONPATH=str(REPO) + os.pathsep + os.environ.get("PYTHONPATH", ""),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", SAVE_WORKER],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = [p.communicate(timeout=300) for p in procs]
    for rank, (proc, (out, err)) in enumerate(zip(procs, outs)):
        assert proc.returncode == 0, f"rank {rank} failed:\n{out}\n{err[-4000:]}"
        assert f"SAVE_OK rank={rank}" in out
