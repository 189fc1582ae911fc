"""The NeRF implicit function as an init/apply pair over a param pytree.

Behavioural reference: ``NeRFMLP`` + ``MLPWithInputSkips`` at
/root/reference/yanerf/pipelines/models/nerf_mlp.py:13-335 and the embedding
helpers at models/nerf_mlp.py:299-335. Architecture:

  * harmonic embedding of ray points (10 freqs) and normalized directions (4);
  * ``n_layers`` MLP with the input re-concatenated at ``input_skips`` layers;
  * density head with zero-initialized bias (avoids transparent init);
  * color head: intermediate linear -> fused ``linear_with_repeat`` over
    (per-point features, per-ray direction embedding) -> ReLU -> [extra
    ``nerf_paper_v1`` layers] -> linear -> sigmoid;
  * optional ``global_codes`` latent conditioning broadcast-concatenated onto
    the xyz embedding (pixelNeRF-style).

TPU-first notes: the model is stateless — ``init`` builds the param pytree,
``apply`` is a pure function safe under jit/grad/vmap/shard_map. All heavy ops
are batched matmuls over the flattened (rays x points) axis; an optional
``compute_dtype='bfloat16'`` runs matmuls on the MXU in bf16 with f32
accumulation while keeping params and head outputs in f32.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from yanerf_tpu.ops.harmonics import harmonic_embedding, harmonic_embedding_dim
from yanerf_tpu.ops.rays import contract_points, ray_bundle_to_ray_points

from .builder import MODELS
from .layers import init_linear_default, init_linear_xavier, linear, linear_with_repeat
from .mlp import MLPWithInputSkips


@MODELS.register_module()
class NeRFMLP:
    def __init__(
        self,
        n_layers: int = 8,
        input_skips: Sequence[int] = (5,),
        n_harmonic_functions_xyz: int = 10,
        harmonic_functions_xyz_append_intput: bool = True,
        n_hidden_neurons_xyz: int = 256,
        n_harmonic_functions_dir: int = 4,
        harmonic_functions_dir_append_intput: bool = True,
        n_hidden_neurons_dir: int = 128,
        latent_dim: int = 0,
        input_xyz: bool = True,
        input_dir: bool = True,
        color_dim: int = 3,
        nerf_paper_v1: bool = False,
        compute_dtype: str = "float32",
        use_pallas: bool = False,
        use_pallas_train: bool = False,
        contract_coords: bool = False,
    ) -> None:
        if not input_xyz and latent_dim <= 0:
            raise ValueError("The latent dimension has to be > 0 if xyz is not input!")

        self.n_layers = n_layers
        self.input_skips = tuple(input_skips)
        self.n_harmonic_functions_xyz = n_harmonic_functions_xyz
        self.harmonic_functions_xyz_append_intput = harmonic_functions_xyz_append_intput
        self.n_hidden_neurons_xyz = n_hidden_neurons_xyz
        self.n_harmonic_functions_dir = n_harmonic_functions_dir
        self.harmonic_functions_dir_append_intput = harmonic_functions_dir_append_intput
        self.n_hidden_neurons_dir = n_hidden_neurons_dir
        self.latent_dim = latent_dim
        self.input_xyz = input_xyz
        self.input_dir = input_dir
        self.color_dim = color_dim
        self.nerf_paper_v1 = nerf_paper_v1
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.use_pallas = use_pallas
        self.contract_coords = contract_coords
        self.use_pallas_train = use_pallas_train

        self.embedding_dim_xyz = harmonic_embedding_dim(3, n_harmonic_functions_xyz, harmonic_functions_xyz_append_intput)
        self.embedding_dim_dir = harmonic_embedding_dim(3, n_harmonic_functions_dir, harmonic_functions_dir_append_intput)
        self.input_dim = self.embedding_dim_xyz * int(input_xyz) + latent_dim
        self.n_extra_color_layers = (n_layers // 4) if nerf_paper_v1 else 0

        self.xyz_encoder = MLPWithInputSkips(
            n_layers=n_layers,
            input_dim=self.input_dim,
            output_dim=n_hidden_neurons_xyz,
            skip_dim=self.input_dim,
            hidden_dim=n_hidden_neurons_xyz,
            input_skips=self.input_skips,
            compute_dtype=self.compute_dtype,
        )

    # -- init ---------------------------------------------------------------
    def init(self, rng: jax.Array) -> Dict[str, Any]:
        keys = jax.random.split(rng, 4)

        xyz_encoder_params = self.xyz_encoder.init(keys[0])

        intermediate = init_linear_xavier(keys[1], self.n_hidden_neurons_xyz, self.n_hidden_neurons_xyz)
        density = init_linear_xavier(keys[2], self.n_hidden_neurons_xyz, 1, zero_bias=True)

        color_in = self.n_hidden_neurons_xyz + (self.embedding_dim_dir if self.input_dir else 0)
        color_keys = jax.random.split(keys[3], 2 + self.n_extra_color_layers)
        color_layers = [init_linear_default(color_keys[0], color_in, self.n_hidden_neurons_dir)]
        for i in range(self.n_extra_color_layers):
            color_layers.append(init_linear_default(color_keys[1 + i], self.n_hidden_neurons_dir, self.n_hidden_neurons_dir))
        color_layers.append(init_linear_default(color_keys[-1], self.n_hidden_neurons_dir, self.color_dim))

        return {
            "xyz_encoder": xyz_encoder_params,
            "intermediate_linear": intermediate,
            "density_layer": density,
            "color_layer": color_layers,
        }

    # -- apply --------------------------------------------------------------
    def _encode_xyz(self, params: Dict[str, Any], embeds: jax.Array) -> jax.Array:
        return self.xyz_encoder.apply(params["xyz_encoder"], embeds)

    def _get_colors(self, params: Dict[str, Any], features: jax.Array, rays_directions: jax.Array) -> jax.Array:
        color_layers = params["color_layer"]
        inter = linear(params["intermediate_linear"], features, self.compute_dtype)
        if self.input_dir:
            dir_norm = rays_directions / jnp.clip(
                jnp.linalg.norm(rays_directions, axis=-1, keepdims=True), min=1e-12
            )
            rays_embedding = harmonic_embedding(
                dir_norm, self.n_harmonic_functions_dir, append_input=self.harmonic_functions_dir_append_intput
            )
            color = linear_with_repeat(color_layers[0], inter, rays_embedding, self.compute_dtype)
        else:
            color = linear(color_layers[0], inter, self.compute_dtype)
        color = jax.nn.relu(color)
        for layer in color_layers[1:-1]:
            color = jax.nn.relu(linear(layer, color, self.compute_dtype))
        # head outputs return to f32: compositing/losses stay full precision
        return jax.nn.sigmoid(linear(color_layers[-1], color, self.compute_dtype).astype(jnp.float32))

    def _concat_global_codes(self, embeds: jax.Array, global_codes) -> jax.Array:
        """Validate + broadcast latent conditioning codes onto the embedding.

        Shared by NeRFMLP/MipNeRFMLP/ProposalMLP (layers.concat_global_codes)
        so the conditioning contract cannot drift between the families.
        """
        from .layers import concat_global_codes

        return concat_global_codes(embeds, global_codes, self.latent_dim)

    def apply(
        self,
        params: Dict[str, Any],
        origins: jax.Array,
        directions: jax.Array,
        lengths: jax.Array,
        global_codes: Optional[jax.Array] = None,
        use_pallas: Optional[bool] = None,
        **kwargs,
    ) -> Dict[str, Any]:
        """Evaluate densities/colors for all ray points.

        Args:
            origins/directions: ``(B, *spatial, 3)``.
            lengths: ``(B, *spatial, P)``.
            global_codes: optional ``(B, latent_dim)`` (or ``(B, N, D)`` with
                ``N*D == latent_dim``) conditioning codes.
            use_pallas: override the constructor flag (the pipeline disables
                the kernel under autodiff — it has no VJP rule).

        Returns:
            ``rays_densities (B, *spatial, P, 1)``,
            ``rays_features (B, *spatial, P, color_dim)``, ``aux``.
        """
        points = ray_bundle_to_ray_points(origins, directions, lengths)
        if self.contract_coords:
            # unbounded scenes: compress R^3 into the radius-2 ball before
            # positional encoding (ops/rays.py::contract_points)
            points = contract_points(points)
        use_pallas = self.use_pallas if use_pallas is None else use_pallas

        use_pallas = use_pallas and self.input_xyz and self.latent_dim == 0
        if use_pallas:
            if global_codes is not None:
                # latent_dim == 0 here; codes would fail validation anyway
                raise ValueError(
                    f"global_codes dim {global_codes.reshape(global_codes.shape[0], -1).shape[-1]} "
                    f"is incompatible with latent_dim {self.latent_dim}"
                )
            # fused forward (+ custom-VJP fused backward when differentiated);
            # the kernel embeds in-register, skipping the XLA embedding
            from yanerf_tpu.ops.pallas import make_fused_mlp

            raw_densities, rays_colors = make_fused_mlp(self)(params, points, directions)
            return dict(rays_densities=raw_densities, rays_features=rays_colors, aux={})

        if self.input_xyz:
            embeds = harmonic_embedding(
                points, self.n_harmonic_functions_xyz, append_input=self.harmonic_functions_xyz_append_intput
            )
        else:
            embeds = jnp.zeros((*points.shape[:-1], 0), dtype=points.dtype)

        embeds = self._concat_global_codes(embeds, global_codes)

        features = self._encode_xyz(params, embeds)
        raw_densities = linear(params["density_layer"], features, self.compute_dtype).astype(jnp.float32)
        rays_colors = self._get_colors(params, features, directions)

        return dict(rays_densities=raw_densities, rays_features=rays_colors, aux={})


@MODELS.register_module()
class ZeroOutputer:
    """Debug/fake model emitting zero densities/colors for analytic tests.

    Behavioural reference: models/zero_outputer.py:14-36.
    """

    latent_dim = 0

    def __init__(self) -> None:
        pass

    def init(self, rng: jax.Array) -> Dict[str, Any]:
        # A dummy parameter keeps optimizers and pytree plumbing uniform.
        return {"dummy": jnp.zeros((1,), dtype=jnp.float32)}

    def apply(
        self,
        params: Dict[str, Any],
        origins: jax.Array,
        directions: jax.Array,
        lengths: jax.Array,
        global_codes: Optional[jax.Array] = None,
        **kwargs,
    ) -> Dict[str, Any]:
        batch, *spatial, _ = origins.shape
        n_pts = lengths.shape[-1]
        zero = params["dummy"][0] * 0.0
        densities = jnp.zeros((batch, *spatial, n_pts, 1), dtype=origins.dtype) + zero
        colors = jnp.zeros((batch, *spatial, n_pts, 3), dtype=origins.dtype) + zero
        return dict(rays_densities=densities, rays_features=colors, aux={})
