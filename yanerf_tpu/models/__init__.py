from .builder import MODELS
from .layers import init_linear_default, init_linear_xavier, linear, linear_with_repeat
from .nerf_mlp import NeRFMLP, ZeroOutputer

__all__ = [
    "MODELS",
    "NeRFMLP",
    "ZeroOutputer",
    "init_linear_default",
    "init_linear_xavier",
    "linear",
    "linear_with_repeat",
]
