from .blender import BlenderDataset, BlenderDatasetWrapper
from .builder import DATASETS
from .llff import LLFFDataset, LLFFDatasetWrapper
from .multiscene import MultiSceneBlenderDataset, MultiSceneBlenderWrapper
from .loader import (
    DataLoader,
    DeviceCachedLoader,
    ShardedEpochSampler,
    Subset,
    create_loader,
    create_sampler,
    decode_cached_field,
    stack_batch,
)
from .utils import load_image

__all__ = [
    "DATASETS",
    "BlenderDataset",
    "BlenderDatasetWrapper",
    "LLFFDataset",
    "LLFFDatasetWrapper",
    "MultiSceneBlenderDataset",
    "MultiSceneBlenderWrapper",
    "DataLoader",
    "DeviceCachedLoader",
    "ShardedEpochSampler",
    "Subset",
    "create_loader",
    "create_sampler",
    "stack_batch",
    "load_image",
]
