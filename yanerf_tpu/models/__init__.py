from .builder import MODELS
from .hash_grid import HashGridNeRF
from .layers import init_linear_default, init_linear_xavier, linear, linear_with_repeat
from .mip_nerf import MipNeRFMLP
from .nerf_mlp import NeRFMLP, ZeroOutputer
from .proposal_mlp import ProposalMLP

__all__ = [
    "MODELS",
    "HashGridNeRF",
    "MipNeRFMLP",
    "NeRFMLP",
    "ProposalMLP",
    "ZeroOutputer",
    "init_linear_default",
    "init_linear_xavier",
    "linear",
    "linear_with_repeat",
]
