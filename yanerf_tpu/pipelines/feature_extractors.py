"""Feature extractor stage: extra batch kwargs -> conditioning tensors.

Behavioural reference: /root/reference/yanerf/pipelines/feature_extractors/.
Extractors map dataset-provided kwargs to a dict that must (currently) contain
``global_codes``; the pipeline stacks multiple extractors' tensor outputs on
dim 1 (reference nerf_pipeline.py:164-176).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .builder import FEATURE_EXTRACTORS


@FEATURE_EXTRACTORS.register_module()
class IdentityMapper:
    """Pass extra batch kwargs through unchanged (reference identity_mapper.py:5-11)."""

    def __init__(self) -> None:
        pass

    def init(self, rng: jax.Array) -> Dict[str, Any]:
        return {}

    def apply(self, params: Dict[str, Any], **kwargs) -> Dict[str, Any]:
        return kwargs


@FEATURE_EXTRACTORS.register_module()
class LearnedSceneEmbedding:
    """Trainable per-scene latent codes gathered by ``scene_id``.

    The pixelNeRF/DeepSDF auto-decoder pattern on this framework's own
    extension seam: the extractor holds an ``(n_scenes, latent_dim)`` code
    table as PARAMETERS (feature-extractor params live in the pipeline's
    param pytree, so the optimizer trains them jointly with the MLP), and
    maps the dataset-provided integer ``scene_id`` batch kwarg to
    ``global_codes`` — which ``NeRFMLP`` broadcast-concatenates onto its
    embeddings (conditioning contract per ref models/nerf_mlp.py:160-183;
    extractor stage per ref nerf_pipeline.py:164-176). The reference ships
    only the pass-through ``IdentityMapper``; this is the capability
    BASELINE.json configs[4] names as the stretch goal.

    TPU notes: one ``(B,)`` row gather per forward — nothing else; the code
    table is tiny and replicated.
    """

    def __init__(self, n_scenes: int, latent_dim: int, init_scale: float = 0.01) -> None:
        if n_scenes <= 0 or latent_dim <= 0:
            raise ValueError(f"n_scenes and latent_dim must be positive, got {n_scenes}, {latent_dim}")
        self.n_scenes = int(n_scenes)
        self.latent_dim = int(latent_dim)
        self.init_scale = float(init_scale)

    def init(self, rng: jax.Array) -> Dict[str, Any]:
        codes = self.init_scale * jax.random.normal(
            rng, (self.n_scenes, self.latent_dim), dtype=jnp.float32
        )
        return {"codes": codes}

    def apply(self, params: Dict[str, Any], scene_id=None, **kwargs) -> Dict[str, Any]:
        if scene_id is None:
            raise ValueError(
                "LearnedSceneEmbedding requires a scene_id batch kwarg "
                "(e.g. from MultiSceneBlenderDataset)"
            )
        idx = jnp.asarray(scene_id, jnp.int32).reshape(-1)  # (B,)
        return {"global_codes": jnp.take(params["codes"], idx, axis=0)}
