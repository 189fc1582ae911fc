"""Dataset helpers (reference: /root/reference/yanerf/dataset/utils.py).

``load_image`` prefers the native C++ decoder (yanerf_tpu.native: libpng /
libjpeg, no GIL) and falls back to PIL; both produce identical float32 RGB
in [0, 1].
"""

from __future__ import annotations

from pathlib import Path
from typing import Union

import numpy as np

from yanerf_tpu import native


def load_image(path: Union[str, Path]) -> np.ndarray:
    """Load an image as float32 RGB in [0, 1], shape (H, W, 3)."""
    if native.available():
        try:
            return native.decode_image(str(path))
        except (IOError, RuntimeError):
            pass  # unknown format etc. -> PIL fallback
    from PIL import Image

    with Image.open(path) as pil_im:
        im = np.array(pil_im.convert("RGB"))
    return im.astype(np.float32) / 255.0
