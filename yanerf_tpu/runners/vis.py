"""Visualization dumps (reference runners/utils.py:22-62).

Writes every ``rendered_*`` prediction (and sampled GT, when present under a
matching prefix) as PNGs under
``{output_dir}/visualization/{split}/{type}/[{epoch}/]{global_idx}.png``,
max-normalizing depth/alpha maps per item.
"""

from __future__ import annotations

from enum import Enum
from functools import lru_cache
from pathlib import Path
from typing import Dict, List, Union

import imageio
import numpy as np


class RunType(Enum):
    TRAIN = "train"
    VAL = "val"
    TEST = "test"


def to_img(tensor_img) -> np.ndarray:
    arr = np.asarray(tensor_img)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]  # imageio needs 2-D for grayscale
    return np.clip(arr * 255.0, 0, 255).astype(np.uint8)


@lru_cache(maxsize=None)
def _vis_dir(output_dir: str, run_type_value: str, rendered_type: str, prefix) -> Path:
    vis_dir = Path(output_dir) / "visualization" / run_type_value / rendered_type
    if prefix is not None:
        vis_dir = vis_dir / prefix
    vis_dir.mkdir(exist_ok=True, parents=True)
    return vis_dir


def vis_batch_img(
    preds: Dict,
    run_type: RunType,
    output_dir: Union[str, Path],
    output_start_idx: int,
    output_end_idx: int,
    file_name_prefix: str = "",
    file_name_ext: str = ".png",
    render_prefixes: List[str] = ["rendered_", "image_rgb_"],
) -> None:
    if file_name_prefix.endswith("/"):
        prefix, file_name_prefix = file_name_prefix, ""
    else:
        prefix = None
    template = file_name_prefix + "{:05d}" + file_name_ext

    for rendered_type, renders in preds.items():
        if not any(rendered_type.startswith(p) for p in render_prefixes):
            continue
        renders = np.asarray(renders)
        if "depths" in rendered_type or "alpha_masks" in rendered_type:
            flat_max = renders.reshape(renders.shape[0], -1).max(axis=1)
            flat_max = np.where(flat_max <= 0, 1.0, flat_max)
            renders = renders / flat_max.reshape(-1, *([1] * (renders.ndim - 1)))

        end_idx = output_start_idx + min(output_end_idx - output_start_idx, len(renders))
        vis_dir = _vis_dir(str(output_dir), run_type.value, rendered_type, prefix)
        for batch_idx, file_idx in enumerate(range(output_start_idx, end_idx)):
            imageio.imwrite(vis_dir / template.format(file_idx), to_img(renders[batch_idx]))


class AsyncVisWriter:
    """Background visualization writer: overlaps the device->host fetch and
    PNG encode/write of eval frames with the next frame's render.

    The eval loop was strictly serial (render -> block -> fetch 7.7MB over
    the device tunnel -> PNG write); at high eval rates the host IO becomes
    the bottleneck. ``submit`` is cheap (it only snapshots the dict); the
    worker thread performs the fetch + writes. ``close`` drains the queue
    and re-raises the first worker error.
    """

    _SENTINEL = object()

    def __init__(self, max_pending: int = 4) -> None:
        import queue
        import threading

        self._queue: "queue.Queue" = queue.Queue(maxsize=max_pending)
        self._error = None
        self._thread = threading.Thread(target=self._run, daemon=True, name="vis-writer")
        self._thread.start()

    def _run(self) -> None:
        while True:
            item = self._queue.get()
            if item is self._SENTINEL:
                return
            try:
                args, kwargs = item
                vis_batch_img(*args, **kwargs)
            except Exception as e:  # surfaced on close()
                if self._error is None:
                    self._error = e

    def submit(self, preds: Dict, *args, render_prefixes=("rendered_", "image_rgb_"), **kwargs) -> None:
        # keep only the image-like entries so the queue doesn't pin the
        # whole preds dict (params/aux) in memory while frames are pending
        subset = {k: v for k, v in preds.items() if any(k.startswith(p) for p in render_prefixes)}
        # forward the SAME prefixes to vis_batch_img — otherwise it
        # re-filters the subset with its own defaults and a caller asking
        # for e.g. ("depth_",) silently writes zero frames
        kwargs = dict(kwargs, render_prefixes=render_prefixes)
        self._queue.put(((subset, *args), kwargs))

    def close(self) -> None:
        self._queue.put(self._SENTINEL)
        self._thread.join()
        if self._error is not None:
            raise self._error
