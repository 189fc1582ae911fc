from yanerf_tpu.utils.registry import Registry

PIPELINES = Registry("pipelines")
RAY_SAMPLERS = Registry("ray_samplers")
RENDERERS = Registry("renderers")
FEATURE_EXTRACTORS = Registry("feature_extractors")
