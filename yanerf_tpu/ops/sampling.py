"""Pixel sampling and gather/scatter between ray sets and image grids.

Behavioural reference:
  * weighted sampling without replacement — reference
    yanerf/pipelines/ray_samplers/ray_sampler.py:317-358 (``_safe_multinomial``).
    On TPU we use the Gumbel-top-k trick instead of ``torch.multinomial``:
    adding i.i.d. Gumbel noise to log-weights and taking the top-k indices is
    distributionally identical to sequential sampling without replacement.
    Degenerate rows (fewer positive weights than samples) gracefully pad with
    zero-weight indices instead of the reference's with-replacement fallback —
    a deliberate, jit-friendly deviation (no data-dependent control flow).
  * ``sample_grid`` — reference yanerf/pipelines/utils.py:272-296
  * ``scatter_rays_to_image`` — reference yanerf/pipelines/utils.py:299-323
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def weighted_sample_without_replacement(
    rng: jax.Array, weights: jax.Array, num_samples: int, approx: bool = False
) -> jax.Array:
    """Sample ``num_samples`` indices per row of ``weights`` w/o replacement.

    Args:
        rng: PRNG key.
        weights: ``(B, N)`` non-negative, unnormalized sampling weights.
        num_samples: static number of samples per row.
        approx: use ``lax.approx_max_k`` for the Gumbel top-k. Exact
            ``top_k`` lowers to a full variadic sort on TPU (~3.5 ms for
            4096-of-640k); the aggregation-based approximate top-k removes
            that at recall 0.95. A full-schedule A/B on the 800x800
            procedural scene (benchmarks/sampler_ab.py, 20k iters) measured
            a ~0.5 dB tail PSNR cost for approx (35.35 -> 34.83), so the
            default is the exact sampler; opt in to approx via
            ``ray_sampler.approx_top_k`` where throughput matters
            (configs/nerf/lego_tpu.yml does).

    Returns:
        ``(B, num_samples)`` int32 indices into the last axis.
    """
    finfo = jnp.finfo(weights.dtype)
    gumbel = jax.random.gumbel(rng, weights.shape, dtype=weights.dtype)
    log_w = jnp.log(jnp.maximum(weights, finfo.tiny))
    keys = jnp.where(weights > 0, log_w + gumbel, -jnp.inf)
    if approx and num_samples * 4 <= weights.shape[-1]:
        _, idx = jax.lax.approx_max_k(keys, num_samples, recall_target=0.95)
    else:
        _, idx = jax.lax.top_k(keys, num_samples)
    return idx.astype(jnp.int32)


def weighted_sample_with_replacement(
    rng: jax.Array, weights: jax.Array, num_samples: int
) -> jax.Array:
    """Sample ``num_samples`` indices per row WITH replacement (inverse CDF).

    The cheap throughput alternative to the Gumbel top-k: a cumulative-sum
    over the weights plus a vectorized ``searchsorted`` of ``num_samples``
    uniforms — no 640k-key sort (the profiled ~1.2 ms/step of the exact and
    approximate top-k paths, benchmarks/r3_proposal_profile.py). Sampling
    pixels with replacement re-draws a duplicate ray with probability
    ~k/(2N) per sample (~0.3% at 4096 of 640k) — the reference itself falls
    back to with-replacement sampling when short of mask pixels
    (ref ray_sampler.py:342-358). Opt in via ``ray_sampler.pixel_replacement``.
    """
    if weights is None:
        raise ValueError("use uniform_sample_with_replacement for the uniform case")
    cdf = jnp.cumsum(weights, axis=-1)
    total = cdf[..., -1:]
    u = jax.random.uniform(rng, (*weights.shape[:-1], num_samples), dtype=weights.dtype)
    # searchsorted per row: first index with cdf > u * total. side='right'
    # is the exact inverse CDF — with side='left' a draw of exactly 0.0
    # would select index 0 even when weights[0] == 0 (a masked-out pixel)
    idx = jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="right"))(cdf, u * total)
    return jnp.clip(idx, 0, weights.shape[-1] - 1).astype(jnp.int32)


def uniform_sample_with_replacement(
    rng: jax.Array, batch_size: int, n: int, num_samples: int
) -> jax.Array:
    """Uniform index sampling with replacement — a bare ``randint``.

    The no-mask case (e.g. the lego schedule) needs no weighting at all:
    ``randint`` costs microseconds where even the cumsum+searchsorted
    inverse CDF spends ~0.9 ms on 640k-pixel rows (and the Gumbel top-k
    ~1.2 ms, benchmarks/r3_speed_followup.py).
    """
    return jax.random.randint(rng, (batch_size, num_samples), 0, n, dtype=jnp.int32)


def sample_grid(tensor: jax.Array, image_sampling_grid: jax.Array) -> jax.Array:
    """Gather image values at integer pixel coordinates.

    Args:
        tensor: ``(B, H, W, C)`` image.
        image_sampling_grid: ``(B, *spatial, 2)`` pixel coordinates (x, y).

    Returns:
        ``(B, *spatial, C)`` gathered values.
    """
    batch_size = tensor.shape[0]
    height, width = tensor.shape[1], tensor.shape[2]
    channels = tensor.shape[-1]
    grid_spatial = image_sampling_grid.shape[1:-1]

    flat_tensor = tensor.reshape(batch_size, height * width, channels)
    flat_grid = image_sampling_grid.reshape(batch_size, -1, 2)
    flat_idx = (flat_grid[..., 0] + width * flat_grid[..., 1]).astype(jnp.int32)
    gathered = jnp.take_along_axis(flat_tensor, flat_idx[..., None], axis=1)
    return gathered.reshape(batch_size, *grid_spatial, channels)


def scatter_rays_to_image(
    tensor: jax.Array,
    image_sampling_grid: jax.Array,
    image_height: int,
    image_width: int,
    bg_color: Optional[jax.Array] = None,
) -> jax.Array:
    """Splat per-ray values back onto an image grid (Monte-Carlo rasterization).

    Args:
        tensor: ``(B, *spatial, C)`` per-ray values.
        image_sampling_grid: ``(B, *spatial, 2)`` the rays' pixel coordinates.
        image_height/image_width: output image size.
        bg_color: optional ``(B, H, W, C)``-broadcastable background fill.

    Returns:
        ``(B, image_height, image_width, C)``.
    """
    batch_size = tensor.shape[0]
    channels = tensor.shape[-1]

    flat_tensor = tensor.reshape(batch_size, -1, channels)
    flat_grid = image_sampling_grid.reshape(batch_size, -1, 2)
    flat_idx = (flat_grid[..., 0] + image_width * flat_grid[..., 1]).astype(jnp.int32)

    output = jnp.zeros((batch_size, image_height, image_width, channels), dtype=tensor.dtype)
    if bg_color is not None and bg_color.shape[-1] == channels:
        output = output + bg_color
    output = output.reshape(batch_size, image_height * image_width, channels)

    batch_idx = jnp.arange(batch_size, dtype=jnp.int32)[:, None]
    output = output.at[batch_idx, flat_idx].set(flat_tensor)
    output = jax.lax.stop_gradient(output)
    return output.reshape(batch_size, image_height, image_width, channels)
