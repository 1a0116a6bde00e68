"""Image resizing (bilinear / area) matching cv2 semantics.

Replaces the reference's host-side ``cv2.resize`` calls
(stitcher.py:419-421, features.py:318) with device code so image shrink can
run on TPU alongside the rest of the pipeline.
"""
from __future__ import annotations

import jax.numpy as jnp

from pano360_tpu.ops.warp import remap_bilinear


def resize_bilinear(img: jnp.ndarray, out_shape):
    """Bilinear resize to ``(height, width)``, cv2.INTER_LINEAR convention.

    cv2 maps destination pixel centers to source coordinates via
    ``src = (dst + 0.5) * scale - 0.5`` and clamps the sample footprint to
    the image (replicate border).
    """
    oh, ow = out_shape
    h, w = img.shape[:2]
    sy = h / oh
    sx = w / ow
    ys = (jnp.arange(oh, dtype=jnp.float32) + 0.5) * sy - 0.5
    xs = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * sx - 0.5
    my, mx = jnp.meshgrid(ys, xs, indexing="ij")
    return remap_bilinear(img, mx, my, border="replicate")


def shrink_area(img: jnp.ndarray, factor: int):
    """Integer-factor area downsample (mean pool), cv2.INTER_AREA for ints."""
    h, w = img.shape[:2]
    nh, nw = h // factor, w // factor
    crop = img[: nh * factor, : nw * factor]
    if img.ndim == 2:
        return crop.reshape(nh, factor, nw, factor).mean(axis=(1, 3))
    c = img.shape[2]
    return crop.reshape(nh, factor, nw, factor, c).mean(axis=(1, 3))


__all__ = ["resize_bilinear", "shrink_area"]
