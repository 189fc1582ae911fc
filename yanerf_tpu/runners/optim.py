"""Optimizer + train state construction.

Behavioural reference: Adam construction at reference scripts/run.py:158-160
and prefix-filtered param groups at runners/utils.py:148-184. The torch
``weight_decay`` semantics (L2 added to the gradient *before* Adam moments)
map to ``optax.add_decayed_weights`` ahead of ``scale_by_adam``. Per-prefix
learning rates become an ``optax.multi_transform`` over a label pytree keyed
by dotted parameter paths, each group with its own scaled schedule —
reproducing the reference's ``base * init_lr`` group semantics.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from yanerf_tpu.utils.logging import get_logger

from .schedules import create_lr_schedule


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def path_to_dotted(path: Tuple) -> str:
    parts = []
    for key in path:
        if hasattr(key, "key"):
            parts.append(str(key.key))
        elif hasattr(key, "idx"):
            parts.append(str(key.idx))
        elif hasattr(key, "name"):
            parts.append(str(key.name))
        else:
            parts.append(str(key))
    return ".".join(parts)


def _adam_chain(schedule: Callable, weight_decay: float) -> optax.GradientTransformation:
    transforms: List[optax.GradientTransformation] = []
    if weight_decay and weight_decay > 0.0:
        transforms.append(optax.add_decayed_weights(weight_decay))
    transforms.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    transforms.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*transforms)


def create_optimizer(runner_config, params: Optional[Any] = None) -> optax.GradientTransformation:
    """Build the Adam optimizer with schedules and optional param groups.

    ``runner_config`` carries init_lr / min_lr / weight_decay / warmup and
    decay settings, plus optional ``lr_param_groups`` entries with
    ``prefix`` and ``base`` (lr multiplier) fields.

    ``runner.flatten_optimizer: true`` wraps the no-groups transform in
    ``optax.flatten`` (one flat-vector Adam update instead of per-leaf
    fusions). Measured on the proposal flagship it is a wash — 14.16 vs
    14.20 ms/step (benchmarks/r3_speed_followup.py): XLA already overlaps
    the per-leaf updates, so the trace's per-leaf fusion time was not
    critical-path. Default off, since flattening changes the checkpointed
    opt_state layout.
    """
    logger = get_logger(__name__)
    weight_decay = float(runner_config.get("weight_decay", 0.0) or 0.0)
    groups = runner_config.get("lr_param_groups", None) or []

    if not groups:
        chain = _adam_chain(create_lr_schedule(runner_config), weight_decay)
        if runner_config.get("flatten_optimizer", False):
            chain = optax.flatten(chain)
        return chain

    if params is None:
        raise ValueError("lr_param_groups requires params to build the label pytree")

    prefixes = [g["prefix"] for g in groups]
    bases = [float(g["base"]) for g in groups]
    init_lr = float(runner_config["init_lr"])

    transforms: Dict[str, optax.GradientTransformation] = {}
    for i, base in enumerate(bases):
        transforms[f"group_{i}"] = _adam_chain(
            create_lr_schedule(runner_config, init_lr=base * init_lr), weight_decay
        )
    transforms["default"] = _adam_chain(create_lr_schedule(runner_config), weight_decay)

    def label_of(path, _leaf) -> str:
        dotted = path_to_dotted(path)
        for i, prefix in enumerate(prefixes):
            if dotted.startswith(prefix):
                return f"group_{i}"
        return "default"

    labels = jax.tree_util.tree_map_with_path(label_of, params)
    counts: Dict[str, int] = {}
    for leaf in jax.tree_util.tree_leaves(labels):
        counts[leaf] = counts.get(leaf, 0) + 1
    logger.info(f"param groups: {counts} (prefixes: {prefixes}, lr multipliers: {bases})")
    return optax.multi_transform(transforms, labels)


def create_train_state(params: Any, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params), step=jnp.zeros((), dtype=jnp.int32))
