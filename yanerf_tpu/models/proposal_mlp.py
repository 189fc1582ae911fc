"""Density-only proposal MLP — the cheap sampler model of the proposal
estimator (NerfAcc / mip-NeRF 360, PAPERS.md).

A tiny view-independent MLP (default 4x128 vs the main model's 8x256,
~20x fewer per-point FLOPs) whose only job is to predict where along each
ray the density lives; the proposal renderer turns its output into
emission-absorption weights and importance-samples the expensive model's
point budget from them. Same pipeline/model contract as NeRFMLP
(ref yanerf/pipelines/models/nerf_mlp.py:117-177): ``apply(params,
origins, directions, lengths, **kw) -> dict(rays_densities,
rays_features, aux)`` — ``rays_features`` is a zero placeholder since
proposal passes never composite colors.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from yanerf_tpu.ops.harmonics import harmonic_embedding, harmonic_embedding_dim
from yanerf_tpu.ops.rays import contract_points, ray_bundle_to_ray_points

from .builder import MODELS
from .layers import concat_global_codes, init_linear_xavier, linear


@MODELS.register_module()
class ProposalMLP:
    """Harmonic embedding -> n_layers x hidden Linear+ReLU -> raw density."""

    def __init__(
        self,
        n_layers: int = 4,
        hidden_dim: int = 128,
        n_harmonic_functions_xyz: int = 10,
        harmonic_functions_xyz_append_intput: bool = True,
        color_dim: int = 3,
        compute_dtype: str = "float32",
        contract_coords: bool = False,
        latent_dim: int = 0,
    ) -> None:
        self.n_layers = n_layers
        self.hidden_dim = hidden_dim
        self.n_harmonic_functions_xyz = n_harmonic_functions_xyz
        self.harmonic_functions_xyz_append_intput = harmonic_functions_xyz_append_intput
        self.color_dim = color_dim
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.contract_coords = contract_coords
        # latent conditioning (round 5): in a multi-scene setting the
        # proposal DENSITY is scene-dependent too, so the sampler model
        # takes the same broadcast-concat global_codes as NeRFMLP
        # (contract per ref nerf_mlp.py:160-183); 0 = unconditioned.
        self.latent_dim = int(latent_dim)
        self.input_dim = (
            harmonic_embedding_dim(3, n_harmonic_functions_xyz, harmonic_functions_xyz_append_intput)
            + self.latent_dim
        )

    def init(self, rng: jax.Array) -> Dict[str, Any]:
        keys = jax.random.split(rng, self.n_layers + 1)
        layers = []
        dim = self.input_dim
        for li in range(self.n_layers):
            layers.append(init_linear_xavier(keys[li], dim, self.hidden_dim))
            dim = self.hidden_dim
        # zero-init density bias, as in NeRFMLP (ref nerf_mlp.py:66-71)
        density = init_linear_xavier(keys[-1], dim, 1, zero_bias=True)
        return {"mlp": layers, "density_layer": density}

    def apply(
        self,
        params: Dict[str, Any],
        origins: jax.Array,
        directions: jax.Array,
        lengths: jax.Array,
        global_codes: Optional[jax.Array] = None,
        **kwargs,
    ) -> Dict[str, Any]:
        points = ray_bundle_to_ray_points(origins, directions, lengths)
        if self.contract_coords:
            points = contract_points(points)
        x = harmonic_embedding(
            points,
            self.n_harmonic_functions_xyz,
            append_input=self.harmonic_functions_xyz_append_intput,
        )
        x = concat_global_codes(x, global_codes, self.latent_dim).astype(self.compute_dtype)
        for layer in params["mlp"]:
            x = jax.nn.relu(linear(layer, x, self.compute_dtype))
        raw_density = linear(params["density_layer"], x, self.compute_dtype).astype(jnp.float32)
        features = jnp.zeros((*raw_density.shape[:-1], self.color_dim), jnp.float32)
        return dict(rays_densities=raw_density, rays_features=features, aux={})
