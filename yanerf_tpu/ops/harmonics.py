"""Harmonic (sin/cos positional) embeddings.

Behavioural reference: ``HarmonicEmbedding`` at
/root/reference/yanerf/pipelines/models/utils.py:17-132. The output layout is
``[sin(f_1 x) .. sin(f_N x) ... per input dim interleaved, cos(...), x?]`` —
specifically ``(x[..., None] * freqs).reshape(..., -1)`` so frequencies vary
fastest, matching the reference bit-for-bit in float32.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=16)
def harmonic_frequencies(n_harmonic_functions: int, omega_0: float = 1.0, logspace: bool = True) -> np.ndarray:
    if logspace:
        freqs = 2.0 ** np.arange(n_harmonic_functions, dtype=np.float32)
    else:
        freqs = np.linspace(1.0, 2.0 ** (n_harmonic_functions - 1), n_harmonic_functions, dtype=np.float32)
    return freqs * omega_0


def harmonic_embedding(
    x: jax.Array,
    n_harmonic_functions: int = 6,
    omega_0: float = 1.0,
    logspace: bool = True,
    append_input: bool = True,
) -> jax.Array:
    """Embed ``x (..., D)`` to ``(..., D * (2 * n_harmonic_functions + append))``."""
    freqs = jnp.asarray(harmonic_frequencies(n_harmonic_functions, omega_0, logspace), dtype=x.dtype)
    embed = (x[..., None] * freqs).reshape(*x.shape[:-1], -1)
    parts = (jnp.sin(embed), jnp.cos(embed), x) if append_input else (jnp.sin(embed), jnp.cos(embed))
    return jnp.concatenate(parts, axis=-1)


def harmonic_embedding_dim(input_dims: int, n_harmonic_functions: int, append_input: bool) -> int:
    """Output dim of :func:`harmonic_embedding` for the given settings."""
    return input_dims * (2 * n_harmonic_functions + int(append_input))
