"""Emission-absorption alpha compositing along rays.

Behavioural reference: ``EmissionAbsorptionRaymarcher`` at
/root/reference/yanerf/pipelines/renderers/multipass_emission_absorpsion_renderer.py:120-239.

Contract notes (kept bit-comparable in float32):
  * the last delta is the ``background_opacity`` (1e10) sentinel;
  * deltas are scaled by ``||direction||`` so unnormalized directions carry
    the depth->euclidean-distance conversion;
  * transmittance is ``cap(cumsum(delta * sigma))`` rolled by
    ``surface_thickness`` with ones at the front (NOT the usual exclusive
    cumsum formulation — identical result for the default settings);
  * ``weights.sum(-1) <= 1`` holds;
  * background blending is soft (``alpha * feat + (1 - op) * bg``) or hard
    (replace the last sample's feature with the bg color).

Everything is a pure function; the density noise draw takes an explicit key.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _capping_function(name: str):
    if name == "exponential":
        return lambda x: 1.0 - jnp.exp(-x)
    if name == "cap1":
        return lambda x: jnp.clip(x, max=1.0)
    raise ValueError(f"Unknown capping_function: {name}")


def _weight_function(name: str):
    if name == "product":
        return lambda curr, acc: curr * acc
    if name == "minimum":
        return jnp.minimum
    raise ValueError(f"Unknown weight_function: {name}")


def _density_activation(name: Optional[str], density_relu: bool):
    """Resolve the density activation.

    ``density_activation`` (relu | softplus | none) supersedes the older
    boolean ``density_relu`` (kept for config back-compat: True -> relu,
    False -> none). ``softplus`` is the mip-NeRF choice (Barron et al.
    2021 use softplus(raw + bias) with bias -1 via
    ``density_pre_activation_bias``): unlike relu it has nonzero gradient
    for raw < 0, so a ray whose density collapsed early can still recover
    — the stability lever for the fog local minimum.
    """
    if name is None:
        name = "relu" if density_relu else "none"
    if name == "relu":
        return jax.nn.relu
    if name == "softplus":
        return jax.nn.softplus
    if name == "none":
        # None (not identity): the raw-density path also skips the pre/post
        # biases, matching the historical density_relu=False behavior bit-exactly
        return None
    raise ValueError(f"Unknown density_activation: {name}")


def emission_absorption_weights(
    rays_densities: jax.Array,
    ray_lengths: jax.Array,
    ray_directions: jax.Array,
    *,
    density_noise_std: float = 0.0,
    rng: Optional[jax.Array] = None,
    capping_function: str = "exponential",
    weight_function: str = "product",
    background_opacity: float = 1e10,
    density_relu: bool = True,
    density_activation: Optional[str] = None,
    density_pre_activation_bias: float = 0.0,
    background_density_bias: float = 0.0,
    surface_thickness: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """The compositing core: per-point weights and per-ray opacities only.

    Identical math (and op order) to the weights computed inside
    ``emission_absorption``; used standalone by the proposal-sampler
    renderer, where proposal passes need transmittance weights but never
    composite features.

    Returns:
        ``(weights (..., P), opacities (..., 1))``.
    """
    cap = _capping_function(capping_function)
    weight_fn = _weight_function(weight_function)
    dtype = rays_densities.dtype

    deltas = jnp.concatenate(
        [
            ray_lengths[..., 1:] - ray_lengths[..., :-1],
            jnp.full_like(ray_lengths[..., :1], background_opacity),
        ],
        axis=-1,
    )
    dir_norm = jnp.linalg.norm(ray_directions, axis=-1)
    deltas = deltas * dir_norm[..., None]

    densities = rays_densities[..., 0]
    if density_noise_std > 0.0:
        if rng is None:
            raise ValueError("density_noise_std > 0 requires an rng key")
        densities = densities + jax.random.normal(rng, densities.shape, dtype=dtype) * density_noise_std
    act = _density_activation(density_activation, density_relu)
    if act is not None:
        densities = act(densities + density_pre_activation_bias) + background_density_bias

    weighted_densities = deltas * densities
    capped_densities = cap(weighted_densities)

    rays_opacities = cap(jnp.cumsum(weighted_densities, axis=-1))
    opacities = rays_opacities[..., -1:]
    absorption_shifted = jnp.roll(1.0 - rays_opacities, surface_thickness, axis=-1)
    ones_head = jnp.ones_like(absorption_shifted[..., :surface_thickness])
    absorption_shifted = jnp.concatenate([ones_head, absorption_shifted[..., surface_thickness:]], axis=-1)

    weights = weight_fn(capped_densities, absorption_shifted)
    return weights, opacities


def emission_absorption(
    rays_densities: jax.Array,
    rays_features: jax.Array,
    ray_lengths: jax.Array,
    ray_directions: jax.Array,
    *,
    density_noise_std: float = 0.0,
    rng: Optional[jax.Array] = None,
    bg_color: Optional[jax.Array] = None,
    default_bg_color: Tuple[float, ...] = (0.0,),
    capping_function: str = "exponential",
    weight_function: str = "product",
    background_opacity: float = 1e10,
    density_relu: bool = True,
    density_activation: Optional[str] = None,
    density_pre_activation_bias: float = 0.0,
    blend_output: bool = False,
    background_density_bias: float = 0.0,
    hard_background: bool = False,
    surface_thickness: int = 1,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Composite per-point densities/features into per-ray renders.

    Args:
        rays_densities: ``(..., P, 1)`` raw densities.
        rays_features: ``(..., P, C)`` per-point features (e.g. RGB).
        ray_lengths: ``(..., P)`` depth samples along each ray.
        ray_directions: ``(..., 3)`` (unnormalized) ray directions.
        density_noise_std: static float; >0 adds N(0, std) noise (needs rng).
        bg_color: ``(..., C)`` per-ray background, or None for the static
            ``default_bg_color``.

    Returns:
        ``(features (..., C), depths (..., 1), opacities (..., 1),
        weights (..., P))``.
    """
    weights, opacities = emission_absorption_weights(
        rays_densities,
        ray_lengths,
        ray_directions,
        density_noise_std=density_noise_std,
        rng=rng,
        capping_function=capping_function,
        weight_function=weight_function,
        background_opacity=background_opacity,
        density_relu=density_relu,
        density_activation=density_activation,
        density_pre_activation_bias=density_pre_activation_bias,
        background_density_bias=background_density_bias,
        surface_thickness=surface_thickness,
    )
    dtype = rays_densities.dtype
    depths = jnp.sum(weights * ray_lengths, axis=-1, keepdims=True)

    n_channels = rays_features.shape[-1]
    if bg_color is None:
        bg = jnp.asarray(default_bg_color, dtype=dtype)
        bg_color = jnp.broadcast_to(bg, (*rays_features.shape[:-2], bg.shape[-1]))
    if bg_color.shape[-1] not in (1, n_channels):
        raise ValueError(f"Background color has {bg_color.shape[-1]} channels, features have {n_channels}.")

    if not hard_background:
        features = jnp.sum(weights[..., None] * rays_features, axis=-2)
        alpha = opacities if blend_output else 1.0
        features = alpha * features + (1.0 - opacities) * bg_color
    else:
        # a validated 1-channel bg must broadcast to C channels before the
        # concat (the soft path broadcasts implicitly via arithmetic)
        bg_row = jnp.broadcast_to(
            bg_color[..., None, :], (*bg_color.shape[:-1], 1, n_channels)
        )
        rays_features = jnp.concatenate([rays_features[..., :-1, :], bg_row], axis=-2)
        features = jnp.sum(weights[..., None] * rays_features, axis=-2)

    return features, depths, opacities, weights
