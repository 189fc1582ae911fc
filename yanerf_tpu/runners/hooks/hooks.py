"""Runner hooks: pluggable data/output transforms around each step.

Behavioural reference: /root/reference/yanerf/runners/hooks/hooks.py:6-73.
Data hooks run on the host batch dict before the jitted step (so they may add
static flags like ``use_smooth``); output hooks post-process predictions.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from yanerf_tpu.utils.registry import Registry

HOOKS = Registry("hooks")


class TrainDataHook(ABC):
    @abstractmethod
    def __call__(self, data, *args, **kwargs):
        return data


class EvalDataHook(ABC):
    @abstractmethod
    def __call__(self, data, *args, **kwargs):
        return data


class TrainOutputsHook(ABC):
    @abstractmethod
    def __call__(self, outputs, *args, **kwargs):
        return outputs


class EvalOutputsHook(ABC):
    @abstractmethod
    def __call__(self, outputs, *args, **kwargs):
        return outputs


@HOOKS.register_module()
class ADNeRFTrainDataHook(TrainDataHook):
    """Enable the smooth flag once training passes ``train_no_smooth_iters``."""

    def __call__(self, data, iter, config, *args, **kwargs):
        data["use_smooth"] = bool(iter >= config["train_no_smooth_iters"])
        return data


@HOOKS.register_module()
class ADNeRFEvalDataHook(EvalDataHook):
    def __call__(self, data, config, *args, **kwargs):
        data["use_smooth"] = bool(config["eval_use_smooth"])
        return data


@HOOKS.register_module()
class SDNeRFTrainDataHook(ADNeRFTrainDataHook):
    pass


@HOOKS.register_module()
class SDNeRFEvalDataHook(ADNeRFEvalDataHook):
    pass


@HOOKS.register_module()
class SDNeRFOutputsHook(TrainOutputsHook, EvalOutputsHook):
    def __call__(self, outputs, *args, **kwargs):
        return outputs
