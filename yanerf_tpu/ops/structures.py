"""Core value types shared across the compute path.

Mirrors the reference contracts:
  * ``RayBundle`` — reference yanerf/pipelines/utils.py:13-18
  * ``EvaluationMode`` — reference yanerf/pipelines/utils.py:8-10
  * ``RenderSamplingMode`` — reference yanerf/pipelines/ray_samplers/utils.py:7-9
  * ``RendererOutput`` — reference yanerf/pipelines/renderers/utils.py:11-33

``RendererOutput`` is a registered JAX pytree so renders can flow through
``jax.jit`` / ``lax.map`` / ``jax.grad`` unchanged, including the nested
``prev_stage`` chain produced by multipass renderers.
"""

from __future__ import annotations

import dataclasses
from enum import Enum
from typing import Any, Dict, NamedTuple, Optional

import jax


class EvaluationMode(Enum):
    TRAINING = "training"
    EVALUATION = "evaluation"


class RenderSamplingMode(Enum):
    MASK_SAMPLE = "mask_sample"
    FULL_GRID = "full_grid"


class RayBundle(NamedTuple):
    """A bundle of rays: origins/directions (..., 3), lengths (..., P), xys (..., 2)."""

    origins: jax.Array
    directions: jax.Array
    lengths: jax.Array
    xys: jax.Array


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RendererOutput:
    """Output of a renderer pass; ``prev_stage`` chains coarse passes.

    Args:
        features: rendered features (usually RGB), ``(B, ..., C)``.
        depths: ray-termination depth map, ``(B, ..., 1)``.
        alpha_masks: rendered opacity in [0, 1], ``(B, ..., 1)``.
        prev_stage: output of the previous (coarser) pass, if any.
        aux: implementation-specific extras (e.g. marching weights).
    """

    features: jax.Array
    depths: jax.Array
    alpha_masks: jax.Array
    prev_stage: Optional["RendererOutput"] = None
    aux: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def tree_flatten(self):
        children = (self.features, self.depths, self.alpha_masks, self.prev_stage, self.aux)
        return children, None

    @classmethod
    def tree_unflatten(cls, aux_data, children):
        features, depths, alpha_masks, prev_stage, aux = children
        return cls(features=features, depths=depths, alpha_masks=alpha_masks, prev_stage=prev_stage, aux=aux)
