"""Pallas TPU kernels for the hot render path (jnp fallbacks behind flags)."""

from .nerf_mlp_bwd import make_fused_mlp, nerf_mlp_backward_pallas
from .nerf_mlp_kernel import nerf_mlp_forward_pallas

__all__ = ["make_fused_mlp", "nerf_mlp_backward_pallas", "nerf_mlp_forward_pallas"]
