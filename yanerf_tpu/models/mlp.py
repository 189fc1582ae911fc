"""The NeRF backbone MLP with input-skip connections, as init/apply.

Behavioural reference: ``MLPWithInputSkips`` at
/root/reference/yanerf/pipelines/models/nerf_mlp.py:186-289 — a stack of
``n_layers`` Linear+ReLU blocks where the designated ``input_skips`` layers
either re-concatenate the skip tensor ``z`` (default) or modulate the
activations with an affine transform predicted from ``z``
(``skip_affine_trans=True``: ``y = (y - mu) * softplus(log_std)``);
``no_last_relu`` makes the final layer linear.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from .layers import init_linear_xavier, linear


class MLPWithInputSkips:
    def __init__(
        self,
        n_layers: int = 8,
        input_dim: int = 39,
        output_dim: int = 256,
        skip_dim: int = 39,
        hidden_dim: int = 256,
        input_skips: Sequence[int] = (5,),
        skip_affine_trans: bool = False,
        no_last_relu: bool = False,
        compute_dtype: str = "float32",
    ) -> None:
        self.n_layers = n_layers
        self.input_dim = input_dim
        self.output_dim = output_dim
        self.skip_dim = skip_dim
        self.hidden_dim = hidden_dim
        self.input_skips = tuple(input_skips)
        self.skip_affine_trans = skip_affine_trans
        self.no_last_relu = no_last_relu
        self.compute_dtype = jnp.dtype(compute_dtype)

    def init(self, rng: jax.Array) -> Dict[str, Any]:
        n_skips = len([s for s in self.input_skips if s > 0])
        keys = jax.random.split(rng, self.n_layers + 2 * max(1, n_skips))
        layers = []
        affines = []
        key_idx = 0
        for li in range(self.n_layers):
            dim_in = self.hidden_dim if li > 0 else self.input_dim
            dim_out = self.hidden_dim if li + 1 < self.n_layers else self.output_dim
            if li > 0 and li in self.input_skips:
                if self.skip_affine_trans:
                    affines.append(
                        {
                            "l1": init_linear_xavier(keys[self.n_layers + key_idx], self.skip_dim, self.hidden_dim * 2),
                            "l2": init_linear_xavier(
                                keys[self.n_layers + key_idx + 1], self.hidden_dim * 2, self.hidden_dim * 2
                            ),
                        }
                    )
                    key_idx += 2
                else:
                    dim_in = self.hidden_dim + self.skip_dim
            layers.append(init_linear_xavier(keys[li], dim_in, dim_out))
        params: Dict[str, Any] = {"mlp": layers}
        if self.skip_affine_trans:
            params["skip_affines"] = affines
        return params

    def _apply_affine(self, affine_params: Dict[str, Any], x: jax.Array, z: jax.Array) -> jax.Array:
        hidden = jax.nn.relu(linear(affine_params["l1"], z, self.compute_dtype))
        mu_log_std = linear(affine_params["l2"], hidden, self.compute_dtype)
        mu, log_std = jnp.split(mu_log_std, 2, axis=-1)
        return (x - mu) * jax.nn.softplus(log_std)

    def apply(self, params: Dict[str, Any], x: jax.Array, z: Optional[jax.Array] = None) -> jax.Array:
        """Run the stack; ``z`` defaults to ``x`` (the usual NeRF skip)."""
        y = x
        if z is None:
            z = x
        if self.compute_dtype != jnp.float32:
            z = z.astype(self.compute_dtype)
        skip_idx = 0
        n = len(params["mlp"])
        for li, layer in enumerate(params["mlp"]):
            if li in self.input_skips and li > 0:
                if self.skip_affine_trans:
                    y = self._apply_affine(params["skip_affines"][skip_idx], y, z)
                else:
                    y = jnp.concatenate([y, z], axis=-1)
                skip_idx += 1
            y = linear(layer, y, self.compute_dtype)
            if not (self.no_last_relu and li + 1 == n):
                y = jax.nn.relu(y)
            if self.compute_dtype != jnp.float32:
                y = y.astype(self.compute_dtype)
        return y
