"""yanerf_tpu — a TPU-native neural radiance field framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
xk-huang/yet-another-nerf: config-driven registries over ray samplers,
implicit-function models, multipass renderers and feature extractors; pure
functional pipelines compiled to single XLA programs; GSPMD sharding over
device meshes for data/ray parallelism; Pallas kernels on the hot render path.
"""

__version__ = "0.1.0"
