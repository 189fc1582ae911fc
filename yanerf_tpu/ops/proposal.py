"""Proposal-sampler (interlevel) loss — the TPU-native fast-NeRF estimator.

The reference framework scales NeRF by evaluating its full MLP at 64 + 192
points per ray (/root/reference/configs/nerf/lego.yml:20-41); GPU-era
accelerations (Instant-NGP hash grids) rely on cached random access that
TPUs lack (measured in docs/performance.md). The TPU-native route to the
same speed class is *sampling efficiency*: tiny density-only proposal
MLPs place a short, well-targeted sample budget for the expensive model —
all matmuls, no gathers. This module implements the histogram consistency
loss that trains the proposals (the "interlevel loss" of mip-NeRF 360,
popularized as the proposal estimator in NerfAcc — PAPERS.md).

Formulation (gather-free, mirroring ops/sample_pdf.py's design): for each
final-pass interval ``[t_i, t_{i+1})`` with emission-absorption weight
``w_i``, the proposal histogram must place at least as much mass on every
region where the final histogram found mass:

    w_outer_i = sum_j w^hat_j * [t^hat_j <= t_{i+1}] * [t^hat_{j+1} >= t_i]
    loss      = sum_i relu(w_i - w_outer_i)^2 / (w_i + eps)

with the final histogram treated as ground truth (stop-gradient), so the
loss only shapes the proposal. Implemented as one broadcast
compare-multiply-reduce over ``(..., N_final, N_prop)`` — no searchsorted,
no gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["distortion_loss", "interlevel_loss"]


def _intervals(lengths: jax.Array, weights: jax.Array):
    """Drop the sentinel interval: EA weight k covers [t_k, t_{k+1}] for
    k < P-1; the last weight belongs to the background_opacity sentinel
    interval [t_{P-1}, inf) and is excluded from histogram matching."""
    return lengths[..., :-1], lengths[..., 1:], weights[..., :-1]


def interlevel_loss(
    final_lengths: jax.Array,
    final_weights: jax.Array,
    prop_lengths: jax.Array,
    prop_weights: jax.Array,
    eps: float = 1e-7,
) -> jax.Array:
    """Per-ray proposal consistency loss.

    Args:
        final_lengths: ``(..., P_f)`` final-pass depth samples (sorted).
        final_weights: ``(..., P_f)`` final-pass EA weights (will be
            stop-gradient'd here).
        prop_lengths: ``(..., P_p)`` proposal-pass depth samples (sorted).
        prop_weights: ``(..., P_p)`` proposal-pass EA weights (gradients
            flow through these).

    Returns:
        ``(...,)`` per-ray loss.
    """
    t_lo, t_hi, w = _intervals(
        jax.lax.stop_gradient(final_lengths), jax.lax.stop_gradient(final_weights)
    )
    that_lo, that_hi, what = _intervals(jax.lax.stop_gradient(prop_lengths), prop_weights)

    # (..., N_f, N_p) inclusive-overlap mask in f32 (bf16 compares crash the
    # Mosaic helper and lose edge precision; these are tiny tensors anyway)
    overlap = (
        (that_lo[..., None, :] <= t_hi[..., :, None])
        & (that_hi[..., None, :] >= t_lo[..., :, None])
    ).astype(jnp.float32)
    # einsum with pinned precision: XLA may lower a broadcast-multiply-
    # reduce to a dot_general, and TPU dots default to bf16 operands
    # (CLAUDE.md) — the f32 the comment above promises must be explicit
    w_outer = jnp.einsum(
        "...p,...fp->...f",
        what.astype(jnp.float32),
        overlap,
        precision=jax.lax.Precision.HIGHEST,
    )

    w = w.astype(jnp.float32)
    excess = jax.nn.relu(w - w_outer)
    return jnp.sum(excess * excess / (w + eps), axis=-1)


def distortion_loss(
    lengths: jax.Array,
    weights: jax.Array,
    in_disparity: bool = False,
    near: jax.Array = None,
    far: jax.Array = None,
) -> jax.Array:
    """Per-ray distortion regularizer (mip-NeRF 360 eq. 15, PAPERS.md).

    Penalizes weight mass that is spread out along the ray — the "floaters
    and background collapse" regularizer:

        L = sum_ij w_i w_j |m_i - m_j|  +  (1/3) sum_i w_i^2 delta_i

    with ``m`` the interval midpoints and ``delta`` the interval widths in
    the published **normalized s-space**: s = (g(t) - g(near)) /
    (g(far) - g(near)), where g is the ray-sampler's spacing function —
    identity for metric sampling, g(t) = 1/t when depths were drawn
    uniformly in disparity (``in_disparity=True``, matching the sampler's
    ``sample_in_disparity``). Without the matching g, far intervals (huge
    in metric t) would dominate the penalty on unbounded scenes and
    over-regularize the background. Like ``interlevel_loss`` this is one
    broadcast multiply-reduce over ``(..., P, P)`` — no gathers,
    MXU/VPU-friendly.

    Args:
        lengths: ``(..., P)`` sorted depth samples.
        weights: ``(..., P)`` emission-absorption weights (the sentinel last
            weight is excluded, as in ``interlevel_loss``).
        in_disparity: set when the depths are disparity-spaced so mids and
            deltas are measured in the matching s coordinate.
        near/far: optional ``(..., 1)`` per-ray sampling bounds defining the
            s normalization, as published (s = (g(t) - g(near)) /
            (g(far) - g(near))). When omitted, the first/last SAMPLE stand
            in — fine for sampler-spaced depths (they sit at the bounds),
            but after importance resampling the sampled span shrinks with
            the very concentration the loss rewards, re-stretching every
            ray to [0, 1] and erasing cross-ray scale. The proposal
            renderer passes its sampler-level bounds.

    Returns:
        ``(...,)`` per-ray loss.
    """
    t_lo, t_hi, w = _intervals(jax.lax.stop_gradient(lengths), weights)
    if in_disparity:
        # g(t) = 1/t; flip so s still increases front-to-back along the ray
        g = lambda t: -1.0 / jnp.maximum(t, 1e-9)  # noqa: E731
        t_lo, t_hi = g(t_lo), g(t_hi)
    else:
        g = lambda t: t  # noqa: E731
    g_near = t_lo[..., :1] if near is None else g(jax.lax.stop_gradient(near))
    g_far = t_hi[..., -1:] if far is None else g(jax.lax.stop_gradient(far))
    span = jnp.maximum(g_far - g_near, 1e-9)
    mids = (0.5 * (t_lo + t_hi) - g_near) / span
    deltas = (t_hi - t_lo) / span

    w = w.astype(jnp.float32)
    mids = mids.astype(jnp.float32)
    cross = jnp.abs(mids[..., :, None] - mids[..., None, :])
    # pinned-precision contraction (see interlevel_loss)
    inter = jnp.einsum(
        "...i,...j,...ij->...", w, w, cross, precision=jax.lax.Precision.HIGHEST
    )
    intra = jnp.sum(w * w * deltas.astype(jnp.float32), axis=-1) / 3.0
    return inter + intra
