"""Sharding-constraint context threaded through the compute path.

GSPMD propagates shardings from inputs, but the ray axis is *created inside*
the jitted program (the sampler draws rays from a replicated image), so the
pipeline must annotate it explicitly. Rather than threading a mesh argument
through every stage, a lightweight context is installed by the runner around
tracing; ``constrain_rays`` is then a no-op unless a mesh context is active.

This is the TPU-native replacement for the reference's NCCL data-parallel
mechanics (SURVEY.md §2.5): with the constraint in place, XLA partitions the
MLP evaluation / compositing over the ray axis and inserts the ICI
collectives (psum for per-sample losses and gradients) automatically.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from .mesh import DATA_AXIS, RAY_AXIS

_state = threading.local()


def active_mesh() -> Optional[Mesh]:
    return getattr(_state, "mesh", None)


@contextmanager
def mesh_context(mesh: Optional[Mesh]):
    """Install ``mesh`` as the active sharding context (None = disable)."""
    previous = getattr(_state, "mesh", None)
    _state.mesh = mesh
    try:
        yield
    finally:
        _state.mesh = previous


def constrain(x: jax.Array, spec: PartitionSpec) -> jax.Array:
    mesh = active_mesh()
    if mesh is None or x is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def constrain_rays(x: Optional[jax.Array], ray_dim: int = 1) -> Optional[jax.Array]:
    """Shard ``x``'s batch dim over DATA_AXIS and ``ray_dim`` over RAY_AXIS."""
    mesh = active_mesh()
    if mesh is None or x is None:
        return x
    spec = [None] * x.ndim
    spec[0] = DATA_AXIS if mesh.shape[DATA_AXIS] > 1 else None
    if mesh.shape[RAY_AXIS] > 1:
        spec[ray_dim] = RAY_AXIS
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, PartitionSpec(*spec)))


def constrain_ray_bundle(bundle, ray_dim: int = 1):
    """Apply :func:`constrain_rays` to every array of a RayBundle."""
    if active_mesh() is None:
        return bundle
    return type(bundle)(*(constrain_rays(t, ray_dim) for t in bundle))
