"""NeRF-synthetic (Blender) dataset loader.

Behavioural reference: /root/reference/yanerf/dataset/blender_dataset.py:18-78.
Contract: reads ``transforms_{split}.json``; focal from ``camera_angle_x``
(``0.5 * W / tan(0.5 * angle)``); val/test subsampled by ``test_skip``;
``scale_down`` integer downscaling of image + focal; camera-to-world poses
right-multiplied by a z/y-flip calibration (camera z points into the screen,
world z out). Items are ``(pose 4x4, focal (1,), image (H, W, 3) in [0, 1])``
and ``data_wrapper`` names the pipeline kwargs.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, NamedTuple, Tuple

import cv2
import numpy as np

from yanerf_tpu.utils.logging import get_logger

from .builder import DATASETS
from .utils import load_image

logger = get_logger(__name__)

# Flip y/z axes: OpenGL-style camera (z into screen) -> world (z out).
CAM_CALIBRATION = np.diag(np.array([1.0, -1.0, -1.0, 1.0], dtype=np.float32))


class BlenderDatasetWrapper(NamedTuple):
    poses: np.ndarray
    focal_lengths: np.ndarray
    image_rgb: np.ndarray


@DATASETS.register_module()
class BlenderDataset:
    data_wrapper: Callable = BlenderDatasetWrapper

    def __init__(self, base_dir, split, scale_down=1, test_skip=8, debug=False):
        if split not in ("train", "val", "test"):
            raise ValueError(f"Invalid split: {split}.")
        self.base_dir = Path(base_dir)
        self.split = split

        with open(self.base_dir / f"transforms_{split}.json") as fp:
            meta = json.load(fp)
        self.frames = meta["frames"]
        if split in ("val", "test"):
            logger.info(f"test_skip = {test_skip}")
            self.frames = self.frames[::test_skip]
        camera_angle_x = float(meta["camera_angle_x"])

        first_img = load_image(self.base_dir / f"{self.frames[0]['file_path']}.png")
        height, width = first_img.shape[:2]
        focal = 0.5 * width / np.tan(0.5 * camera_angle_x)

        if debug:
            scale_down = 32
            logger.info(f"[DEBUG] scale_down {height}x{width} -> {height // scale_down}x{width // scale_down}")
        # isinstance FIRST (a str would crash the `<=` itself), and 0 is as
        # invalid as negative (it would ZeroDivisionError downstream)
        if not isinstance(scale_down, (int, float)) or scale_down <= 0:
            raise TypeError(f"Invalid scale_down: {scale_down!r} (want a number > 0).")

        self.H = int(height // scale_down)
        self.W = int(width // scale_down)
        self.focal = focal / scale_down
        self.scale_down = scale_down

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        frame = self.frames[index]
        pose = np.asarray(frame["transform_matrix"], dtype=np.float32) @ CAM_CALIBRATION
        image = load_image(self.base_dir / f"{frame['file_path']}.png")
        if self.scale_down != 1:
            image = cv2.resize(image, dsize=(self.W, self.H), interpolation=cv2.INTER_LINEAR)
        return (
            pose,
            np.asarray([self.focal], dtype=np.float32),
            image.astype(np.float32),
        )

    def __len__(self) -> int:
        return len(self.frames)
