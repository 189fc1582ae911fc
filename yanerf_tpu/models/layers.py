"""Parameterized linear layers as explicit pytrees + init/apply functions.

Weights are stored ``(in_features, out_features)`` (transposed vs torch) so
the forward pass is a plain ``x @ w + b`` row-major matmul that XLA tiles
directly onto the MXU. Initializers reproduce the reference's distributions:
xavier-uniform where the reference calls ``_xavier_init`` (models/nerf_mlp.py:292),
and torch's default Linear init elsewhere.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]


def init_linear_xavier(rng: jax.Array, in_features: int, out_features: int, zero_bias: bool = False) -> Params:
    """Xavier-uniform weight; torch-default uniform bias (or zeros)."""
    w_key, b_key = jax.random.split(rng)
    w_bound = math.sqrt(6.0 / (in_features + out_features))
    w = jax.random.uniform(w_key, (in_features, out_features), minval=-w_bound, maxval=w_bound, dtype=jnp.float32)
    if zero_bias:
        b = jnp.zeros((out_features,), dtype=jnp.float32)
    else:
        b_bound = 1.0 / math.sqrt(in_features) if in_features > 0 else 0.0
        b = jax.random.uniform(b_key, (out_features,), minval=-b_bound, maxval=b_bound, dtype=jnp.float32)
    return {"w": w, "b": b}


def init_linear_default(rng: jax.Array, in_features: int, out_features: int) -> Params:
    """torch.nn.Linear default init: U(+-1/sqrt(fan_in)) for weight and bias."""
    w_key, b_key = jax.random.split(rng)
    bound = 1.0 / math.sqrt(in_features) if in_features > 0 else 0.0
    w = jax.random.uniform(w_key, (in_features, out_features), minval=-bound, maxval=bound, dtype=jnp.float32)
    b = jax.random.uniform(b_key, (out_features,), minval=-bound, maxval=bound, dtype=jnp.float32)
    return {"w": w, "b": b}


def linear(params: Params, x: jax.Array, compute_dtype: Optional[jnp.dtype] = None) -> jax.Array:
    """``x @ w + b``; under a low-precision compute dtype the whole layer —
    inputs, weights, output, and therefore the backward cotangents — stays in
    that dtype (the MXU still accumulates f32 internally). Keeping cotangents
    bf16 is what keeps the *backward* matmuls on the fast MXU path; an
    f32-output formulation silently runs the backward at f32 rate.
    """
    w, b = params["w"], params["b"]
    if compute_dtype is not None and compute_dtype != jnp.float32:
        return jnp.dot(x.astype(compute_dtype), w.astype(compute_dtype)) + b.astype(compute_dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32) + b


def linear_with_repeat(
    params: Params,
    x: jax.Array,
    y: jax.Array,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """Fused linear over per-point ``x (..., P, n1)`` and per-ray ``y (..., n2)``.

    Equivalent to concatenating ``y`` (broadcast over P) to ``x`` and applying
    one ``(n1 + n2, out)`` linear, but without materializing the concat —
    reference ``LinearWithRepeat`` (models/utils.py:135-211). The weight stays
    a single matrix so torch checkpoints map 1:1.
    """
    w, b = params["w"], params["b"]
    n1 = x.shape[-1]
    w1, w2 = w[:n1], w[n1:]
    if compute_dtype is not None and compute_dtype != jnp.float32:
        out1 = jnp.dot(x.astype(compute_dtype), w1.astype(compute_dtype))
        out2 = jnp.dot(y.astype(compute_dtype), w2.astype(compute_dtype))
        return out1 + b.astype(compute_dtype) + out2[..., None, :]
    out1 = jnp.dot(x, w1, preferred_element_type=jnp.float32)
    out2 = jnp.dot(y, w2, preferred_element_type=jnp.float32)
    return out1 + b + out2[..., None, :]


def concat_global_codes(embeds: jax.Array, global_codes, latent_dim: int) -> jax.Array:
    """Validate + broadcast per-batch latent codes onto a point embedding.

    The conditioning contract shared by every implicit-function family
    (ref yanerf/pipelines/models/nerf_mlp.py:160-183,319-335): codes are
    ``(B, latent_dim)`` (any extra dims flattened), broadcast across all
    spatial/point axes of ``embeds`` and concatenated on the feature axis.
    """
    if global_codes is None:
        if latent_dim != 0:
            raise ValueError("latent_dim > 0 requires global_codes")
        return embeds
    global_codes = global_codes.reshape(global_codes.shape[0], -1)
    if global_codes.shape[-1] != latent_dim:
        raise ValueError(
            f"global_codes dim {global_codes.shape[-1]} is incompatible with latent_dim {latent_dim}"
        )
    bs = embeds.shape[0]
    broadcast_shape = (bs,) + (1,) * (embeds.ndim - 2) + (latent_dim,)
    codes = jnp.broadcast_to(
        global_codes.reshape(broadcast_shape), (*embeds.shape[:-1], latent_dim)
    ).astype(embeds.dtype)
    return jnp.concatenate([embeds, codes], axis=-1)
