"""Device mesh construction for data x ray parallelism.

The reference's parallelism is NCCL DDP over processes (SURVEY.md §2.5). The
TPU-native equivalent is a single ``jax.sharding.Mesh`` over all chips with
two logical axes:

  * ``data`` — batch (image) parallelism: the DDP analog; gradients are
    reduced by GSPMD-inserted ``psum`` over ICI instead of NCCL all-reduce;
  * ``rays`` — intra-image ray parallelism: shards the ray axis of one
    render across chips (the "sequence parallel" analog for NeRF, where the
    sequence is rays x points).

Parameters stay replicated (the MLP is ~1 MB), so no FSDP axis is needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"
RAY_AXIS = "rays"


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data_parallel: Optional[int] = None,
    ray_parallel: Optional[int] = None,
) -> Mesh:
    """Build a (data, rays) mesh over the given (default: all) devices.

    By default all devices go to the ray axis — the flagship configs train
    one image per step, so ray parallelism is the axis that scales.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    both_explicit = data_parallel is not None and ray_parallel is not None
    if data_parallel is None and ray_parallel is None:
        data_parallel, ray_parallel = 1, n
    elif data_parallel is None:
        if ray_parallel <= 0 or n % ray_parallel:
            raise ValueError(f"ray_parallel={ray_parallel} must evenly divide {n} devices")
        data_parallel = n // ray_parallel
    elif ray_parallel is None:
        if data_parallel <= 0 or n % data_parallel:
            raise ValueError(f"data_parallel={data_parallel} must evenly divide {n} devices")
        ray_parallel = n // data_parallel
    total = data_parallel * ray_parallel
    if total > n:
        raise ValueError(f"mesh {data_parallel}x{ray_parallel} needs {total} devices, only {n} available")
    if total < n:
        if not both_explicit:
            # an auto-sized axis quietly idling chips is how a "full
            # machine" run trains at a fraction of the hardware
            raise ValueError(
                f"mesh {data_parallel}x{ray_parallel} uses {total} of {n} devices; "
                "size the axes to cover the machine (or pass an explicit devices subset)"
            )
        # both axes pinned by the user (debug runs / tests legitimately ask
        # for a sub-machine mesh) — honor it, but never silently
        import logging

        logging.getLogger(__name__).warning(
            "mesh %dx%d uses only %d of %d devices; the remaining %d idle",
            data_parallel, ray_parallel, total, n, n - total,
        )
    dev_array = np.asarray(devices[:total]).reshape(data_parallel, ray_parallel)
    return Mesh(dev_array, (DATA_AXIS, RAY_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for host batches: batch dim over the data axis."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
