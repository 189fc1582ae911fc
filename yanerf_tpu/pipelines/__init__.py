from yanerf_tpu.ops.structures import EvaluationMode, RayBundle, RendererOutput, RenderSamplingMode

from .builder import FEATURE_EXTRACTORS, PIPELINES, RAY_SAMPLERS, RENDERERS
from .feature_extractors import IdentityMapper
from .nerf_pipeline import NeRFPipeline
from .ray_sampler import RaySampler
from .renderer import MultipassEmissionAbsorpsionRenderer, refine_ray_points

__all__ = [
    "EvaluationMode",
    "RayBundle",
    "RendererOutput",
    "RenderSamplingMode",
    "FEATURE_EXTRACTORS",
    "PIPELINES",
    "RAY_SAMPLERS",
    "RENDERERS",
    "IdentityMapper",
    "NeRFPipeline",
    "RaySampler",
    "MultipassEmissionAbsorpsionRenderer",
    "refine_ray_points",
]
