"""Feature extractor stage: extra batch kwargs -> conditioning tensors.

Behavioural reference: /root/reference/yanerf/pipelines/feature_extractors/.
Extractors map dataset-provided kwargs to a dict that must (currently) contain
``global_codes``; the pipeline stacks multiple extractors' tensor outputs on
dim 1 (reference nerf_pipeline.py:164-176).
"""

from __future__ import annotations

from typing import Any, Dict

import jax

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
