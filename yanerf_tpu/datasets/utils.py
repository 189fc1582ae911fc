"""Dataset helpers (reference: /root/reference/yanerf/dataset/utils.py)."""

from __future__ import annotations

from pathlib import Path
from typing import Union

import numpy as np
from PIL import Image


def load_image(path: Union[str, Path]) -> np.ndarray:
    """Load an image as float32 RGB in [0, 1], shape (H, W, 3)."""
    with Image.open(path) as pil_im:
        im = np.array(pil_im.convert("RGB"))
    return im.astype(np.float32) / 255.0
