"""Color conversions (matmul-based) and alpha-channel helpers.

Replaces ``cv2.cvtColor`` call sites (features.py:135, stitcher.py:259,
blend.py:41).  Note the reference loads images with cv2.imread, i.e. BGR
channel order; the framework keeps that convention for cache / output parity.
"""
from __future__ import annotations

import jax.numpy as jnp

# cv2 BGR -> gray weights (Rec.601): Y = 0.299 R + 0.587 G + 0.114 B
_BGR2GRAY = (0.114, 0.587, 0.299)


def bgr2gray(img: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) BGR -> (..., H, W) luma, matching cv2.COLOR_BGR2GRAY."""
    w = jnp.asarray(_BGR2GRAY, dtype=img.dtype)
    return img[..., 0] * w[0] + img[..., 1] * w[1] + img[..., 2] * w[2]


def add_alpha(img: jnp.ndarray, alpha=None) -> jnp.ndarray:
    """Append an alpha channel ((..., H, W, 3) -> (..., H, W, 4))."""
    if alpha is None:
        alpha = jnp.ones(img.shape[:-1], dtype=img.dtype)
    return jnp.concatenate([img, alpha[..., None]], axis=-1)


__all__ = ["bgr2gray", "add_alpha"]
