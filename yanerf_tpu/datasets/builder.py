from yanerf_tpu.utils.registry import Registry

DATASETS = Registry("datasets")
