"""Profiling / tracing helpers.

The reference's observability is wall-clock only (``Timer``, SURVEY.md §5);
on TPU we add first-class XLA tracing: ``trace`` wraps a region in a
``jax.profiler`` trace (viewable in TensorBoard/Perfetto/XProf),
``annotate`` names a region inside a trace, and ``StepTimer`` keeps the
reference's data/inference split for the periodic log line.
"""

from __future__ import annotations

import contextlib
from pathlib import Path
from typing import Iterator, Union

from .timer import Timer


@contextlib.contextmanager
def trace(log_dir: Union[str, Path, None], create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed region into ``log_dir``.

    A ``None`` log_dir disables tracing (zero overhead), so call sites can be
    unconditional: ``with trace(cfg.get("profile_dir")): ...``.
    """
    if log_dir is None:
        yield
        return
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(log_dir), create_perfetto_link=create_perfetto_link):
        yield


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Name a region inside an active trace (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Per-step {phase: seconds} accumulator with the reference's split."""

    def __init__(self) -> None:
        self._timer = Timer()
        self.times: dict = {}

    def check(self, phase: str) -> float:
        dur = self._timer.since_last_check()
        self.times[phase] = dur
        return dur

    def reset(self) -> dict:
        out, self.times = self.times, {}
        self._timer.since_last_check()
        return out
