"""Pallas TPU kernels for the hot render path.

Kernels land behind flags with jnp fallbacks (see SURVEY.md §7 step 8). Until
the fused kernels are implemented, the flag-gated entry points raise.
"""

from __future__ import annotations


def nerf_mlp_forward_pallas(model, params, embeds, directions):
    raise NotImplementedError(
        "The fused Pallas NeRF-MLP kernel is not available yet; "
        "construct the model with use_pallas=False."
    )
