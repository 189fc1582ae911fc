"""Pallas TPU kernels for the hot render path (jnp fallbacks behind flags)."""

from .nerf_mlp_kernel import nerf_mlp_forward_pallas

__all__ = ["nerf_mlp_forward_pallas"]
