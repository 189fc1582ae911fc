from yanerf_tpu.utils.registry import Registry

MODELS = Registry("models")
