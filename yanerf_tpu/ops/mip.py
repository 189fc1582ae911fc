"""Cone marching math for the mip-NeRF model family (IPE).

Implements the conical-frustum moment approximation and the integrated
positional encoding from mip-NeRF (Barron et al. 2021, eqs. 7/8/14):
each ray sample is treated as a 3D Gaussian matching the frustum the
pixel's cone sweeps over the sample interval, and the positional encoding
is the closed-form expectation of sin/cos under that Gaussian — high
frequencies whose period is smaller than the footprint attenuate to zero,
giving scale-aware, anti-aliased features.

TPU-first notes: everything here is elementwise VPU math over the same
``(B, *spatial, P)`` shapes the point pipeline uses — no gathers, no
dynamic shapes — and XLA fuses it into the first MLP matmul. The only
structural change vs point sampling is deriving per-sample intervals from
the shared ``lengths`` tensor (:func:`intervals_from_midpoints`), which
keeps every renderer, sampler and loss untouched.

No reference analog (the reference is point-sampled NeRF only); this is a
capability extension. Formulas follow the published paper; the stable
``t_mosq``-form variances are used to avoid cancellation in f32.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .harmonics import harmonic_frequencies


def intervals_from_midpoints(lengths: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-sample depth intervals ``(t0, t1)`` from sample midpoints.

    The pipeline's samplers emit ``P`` sample depths per ray; mip-NeRF wants
    ``P`` intervals. Interior boundaries are midpoints between consecutive
    samples; the first/last are extended by half their neighbouring gap, so
    uniform samples with spacing ``h`` produce uniform width-``h`` intervals
    centred on the samples. (The paper samples ``P+1`` boundaries instead —
    a deliberate deviation that keeps the sample-count contract of every
    existing sampler/renderer; documented in docs/parity.md.)

    Args:
        lengths: ``(..., P)`` sorted sample depths, ``P >= 2``.

    Returns:
        ``t0, t1``: each ``(..., P)`` with ``t0 <= lengths <= t1``.
    """
    mids = 0.5 * (lengths[..., 1:] + lengths[..., :-1])
    # the first edge must not extrapolate past the cone apex (t <= 0): the
    # frustum moment formulas assume 0 < t0 < t1, and a near plane smaller
    # than half the first sample gap would otherwise produce t0 < 0 and a
    # wrong mean/covariance for every ray's first sample
    first = jnp.maximum(
        lengths[..., :1] - (mids[..., :1] - lengths[..., :1]),
        jnp.finfo(lengths.dtype).tiny,
    )
    last = lengths[..., -1:] + (lengths[..., -1:] - mids[..., -1:])
    t0 = jnp.concatenate([first, mids], axis=-1)
    t1 = jnp.concatenate([mids, last], axis=-1)
    return t0, t1


def intervals_from_boundaries(lengths: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-sample intervals treating the samples as interval BOUNDARIES.

    The paper-faithful pairing for this repo's emission-absorption
    convention: the raymarcher composites density ``i`` over ``deltas[i] =
    lengths[i+1] - lengths[i]`` (ops/raymarch.py), so the Gaussian for
    sample ``i`` should moment-match the frustum swept over exactly
    ``[lengths[i], lengths[i+1]]`` — mip-NeRF's P+1-boundary scheme with
    the existing ``P`` sample depths playing the boundary role. The last
    sample (whose compositing delta is the 1e10 background sentinel) gets a
    bounded interval extended by the previous gap.

    ``interval_mode: boundary`` on ``MipNeRFMLP`` selects this;
    :func:`intervals_from_midpoints` (intervals centred on the samples)
    remains the default the shipped quality numbers were measured under.
    """
    t0 = lengths
    last_gap = jnp.maximum(
        lengths[..., -1:] - lengths[..., -2:-1], jnp.finfo(lengths.dtype).tiny
    )
    t1 = jnp.concatenate([lengths[..., 1:], lengths[..., -1:] + last_gap], axis=-1)
    # degenerate (duplicate-depth) intervals: keep t1 >= t0 so the moment
    # formulas stay finite (t_delta == 0 reduces to the point encoding)
    return t0, jnp.maximum(t1, t0)


def conical_frustum_to_gaussian(
    origins: jax.Array,
    directions: jax.Array,
    t0: jax.Array,
    t1: jax.Array,
    base_radius: float,
) -> Tuple[jax.Array, jax.Array]:
    """Moment-match a conical frustum to a diagonal-covariance Gaussian.

    The cone has cross-section radius ``base_radius * t`` at depth ``t``
    (``base_radius`` = pixel footprint per unit depth, ``(2/sqrt(12)) /
    focal`` for a pinhole camera — mip-NeRF computes the same value from
    adjacent unnormalized pixel directions). Uses the paper's numerically
    stable form (eq. 7).

    Args:
        origins/directions: ``(..., 3)``; directions unnormalized, exactly
            as cast by the ray sampler (their norm carries the depth ->
            distance scale, which the covariance lift inherits).
        t0/t1: ``(..., P)`` interval bounds along the ray parametrization.
        base_radius: cone radius growth per unit ``t``.

    Returns:
        ``mean (..., P, 3)`` and diagonal covariance ``var (..., P, 3)``.
    """
    t_mu = 0.5 * (t0 + t1)
    t_delta = 0.5 * (t1 - t0)
    mu_sq, d_sq = t_mu * t_mu, t_delta * t_delta
    denom = jnp.maximum(3.0 * mu_sq + d_sq, 1e-12)
    t_mean = t_mu + 2.0 * t_mu * d_sq / denom
    t_var = d_sq / 3.0 - (4.0 / 15.0) * (d_sq * d_sq * (12.0 * mu_sq - d_sq)) / (denom * denom)
    r_var = (base_radius * base_radius) * (
        mu_sq / 4.0 + (5.0 / 12.0) * d_sq - (4.0 / 15.0) * (d_sq * d_sq) / denom
    )

    mean = origins[..., None, :] + t_mean[..., None] * directions[..., None, :]
    d_outer = directions * directions  # (..., 3)
    d_mag_sq = jnp.maximum(jnp.sum(d_outer, axis=-1, keepdims=True), 1e-12)
    null_outer = 1.0 - d_outer / d_mag_sq
    var = t_var[..., None] * d_outer[..., None, :] + r_var[..., None] * null_outer[..., None, :]
    return mean, var


def integrated_harmonic_embedding(
    mean: jax.Array,
    var: jax.Array,
    n_harmonic_functions: int = 6,
    omega_0: float = 1.0,
    logspace: bool = True,
    append_input: bool = True,
) -> jax.Array:
    """Expected harmonic embedding of ``N(mean, diag(var))`` (IPE, eq. 14).

    ``E[sin(f x)] = sin(f mu) * exp(-f^2 var / 2)`` and likewise for cos —
    the exact layout of :func:`yanerf_tpu.ops.harmonics.harmonic_embedding`
    (frequencies fastest, sin block then cos block) with each component
    damped by its frequency-scaled variance, so ``var == 0`` reproduces the
    point embedding bit-for-bit and param shapes match ``NeRFMLP``. With
    ``append_input`` the raw mean is appended (attenuation 1), keeping the
    input-skip width identical to the point model.
    """
    freqs = jnp.asarray(harmonic_frequencies(n_harmonic_functions, omega_0, logspace), dtype=mean.dtype)
    angle = (mean[..., None] * freqs).reshape(*mean.shape[:-1], -1)
    damp = jnp.exp(-0.5 * (var[..., None] * (freqs * freqs)).reshape(*var.shape[:-1], -1))
    parts = (
        (jnp.sin(angle) * damp, jnp.cos(angle) * damp, mean)
        if append_input
        else (jnp.sin(angle) * damp, jnp.cos(angle) * damp)
    )
    return jnp.concatenate(parts, axis=-1)
