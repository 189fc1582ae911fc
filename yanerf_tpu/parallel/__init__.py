from .distributed import (
    barrier,
    concat_all_gather,
    get_rank,
    get_world_size,
    init_distributed_mode,
    is_dist_avail_and_initialized,
    is_main_process,
    pause_to_debug,
)
from .mesh import DATA_AXIS, RAY_AXIS, batch_sharding, create_mesh, replicated
from .sharding import active_mesh, constrain, constrain_ray_bundle, constrain_rays, mesh_context

__all__ = [
    "barrier",
    "concat_all_gather",
    "get_rank",
    "get_world_size",
    "init_distributed_mode",
    "is_dist_avail_and_initialized",
    "is_main_process",
    "DATA_AXIS",
    "RAY_AXIS",
    "batch_sharding",
    "create_mesh",
    "replicated",
    "active_mesh",
    "constrain",
    "constrain_ray_bundle",
    "constrain_rays",
    "mesh_context",
]
