"""Multi-host process-group helpers.

TPU-native replacement for the reference's NCCL bootstrap
(reference runners/utils.py:187-267 and scripts/run.py:61): process identity
comes from ``jax.process_index/count`` after ``jax.distributed.initialize``
(which discovers peers over DCN from env/SLURM, the analog of
``init_process_group(init_method="env://")``). In-program collectives compile
into the XLA program; the only host-side collective needed is the eval-metric
all-gather, provided here via ``multihost_utils``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def init_distributed_mode(coordinator_address: Optional[str] = None) -> bool:
    """Initialize the multi-host JAX runtime if a multi-process env is detected.

    Detection mirrors the reference (RANK/WORLD_SIZE or SLURM_PROCID env).
    Single-process runs are a no-op returning False.
    """
    world_size = None
    process_id = None
    if "WORLD_SIZE" in os.environ and "RANK" in os.environ:
        world_size = int(os.environ["WORLD_SIZE"])
        process_id = int(os.environ["RANK"])
    elif "SLURM_NTASKS" in os.environ and "SLURM_PROCID" in os.environ:
        world_size = int(os.environ["SLURM_NTASKS"])
        process_id = int(os.environ["SLURM_PROCID"])

    if world_size is None or world_size <= 1:
        return False

    if coordinator_address is None:
        # the env:// convention this function mirrors: torchrun-style
        # launchers export MASTER_ADDR/MASTER_PORT alongside RANK/
        # WORLD_SIZE. Without it jax.distributed.initialize would require
        # cluster auto-detection (SLURM/TPU metadata) and crash elsewhere.
        master_addr = os.environ.get("MASTER_ADDR")
        if master_addr:
            coordinator_address = f"{master_addr}:{os.environ.get('MASTER_PORT', '12355')}"

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=world_size,
        process_id=process_id,
    )
    return True


def is_dist_avail_and_initialized() -> bool:
    return jax.process_count() > 1


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def concat_all_gather(x) -> np.ndarray:
    """Gather per-sample arrays from all processes, concatenated on axis 0.

    Host-level analog of the reference's ``concat_all_gather``
    (runners/utils.py:257-267); used to reassemble per-sample eval losses
    before the truncate-to-dataset-length mean.
    """
    x = np.asarray(x)
    if not is_dist_avail_and_initialized():
        return x
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(x)
    return np.asarray(gathered).reshape(-1, *x.shape[1:])


def barrier(name: str = "barrier") -> None:
    if not is_dist_avail_and_initialized():
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def pause_to_debug() -> None:
    """Drop rank 0 into a debugger, synchronizing other ranks at a barrier
    (reference runners/utils.py:286-293)."""
    if is_main_process():
        import pdb

        pdb.set_trace()
    barrier("pause_to_debug")
