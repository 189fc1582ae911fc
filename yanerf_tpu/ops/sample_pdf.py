"""Hierarchical importance sampling: inverse-CDF ``sample_pdf``.

Behavioural reference: ``sample_pdf_python`` at
/root/reference/yanerf/pipelines/renderers/utils.py:83-158 (itself a port of
the original NeRF release). The reference left a ``TODO: implement the C++
version`` (renderers/utils.py:79); here the native-speed path is a fully
vectorized TPU formulation instead:

``torch.searchsorted`` over batched CDFs maps poorly to TPU. For the NeRF
regime (n_bins ~ 64-192, n_samples ~ 64-128) we replace the binary search with
a dense rank computation ``inds = sum(cdf <= u)`` — an O(n_bins * n_samples)
broadcast-compare-reduce that the VPU executes far faster than a serialized
search, with no dynamic control flow. The gather of surrounding bin edges uses
``take_along_axis``. Results match the reference exactly in float32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sample_pdf(
    bins: jax.Array,
    weights: jax.Array,
    n_samples: int,
    rng: Optional[jax.Array] = None,
    det: bool = False,
    eps: float = 1e-5,
) -> jax.Array:
    """Draw samples from the piecewise-constant pdf defined by bins/weights.

    Args:
        bins: ``(..., n_bins + 1)`` bin edges.
        weights: ``(..., n_bins)`` non-negative per-bin masses.
        n_samples: static number of samples per distribution.
        rng: PRNG key (required when ``det=False``).
        det: deterministic (uniformly spaced u) vs random sampling.
        eps: numerical floor preventing division by zero on empty bins.

    Returns:
        ``(..., n_samples)`` samples.
    """
    dtype = bins.dtype
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (..., n_bins + 1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], n_samples))
    else:
        if rng is None:
            raise ValueError("sample_pdf with det=False requires an rng key")
        u = jax.random.uniform(rng, (*cdf.shape[:-1], n_samples), dtype=dtype)

    # searchsorted(cdf, u, side="right") as a dense rank: count of cdf <= u.
    inds = jnp.sum((cdf[..., None, :] <= u[..., :, None]).astype(jnp.int32), axis=-1)
    below = jnp.clip(inds - 1, 0, cdf.shape[-1] - 1)
    above = jnp.clip(inds, 0, cdf.shape[-1] - 1)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < eps, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)
