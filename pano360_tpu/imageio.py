"""Host-side image I/O (no OpenCV dependency in the framework path).

Replaces the reference's ``cv2.imread``/``imwrite``/``imshow`` call sites
(stitcher.py:418-450). Images are kept in the reference's BGR uint8
convention on disk boundaries and float32 BGR in [0, 1] on device, so cache
files and outputs stay structurally identical.
"""
from __future__ import annotations

import os
from typing import List

import numpy as np
from PIL import Image as PILImage

IMG_EXTS = (".jpg", ".png", ".bmp", ".JPG", ".PNG", ".BMP")


def list_images(path: str) -> List[str]:
    """Image files in a directory, sorted (stitcher.py:415-416 semantics)."""
    return sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(IMG_EXTS))


def imread(path: str) -> np.ndarray:
    """Load an image as uint8 BGR (cv2.imread convention)."""
    img = np.asarray(PILImage.open(path).convert("RGB"))
    return img[..., ::-1].copy()


def imwrite(path: str, img: np.ndarray) -> None:
    """Save a uint8 BGR image."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    PILImage.fromarray(img[..., ::-1]).save(path)


__all__ = ["IMG_EXTS", "list_images", "imread", "imwrite"]
