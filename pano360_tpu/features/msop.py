"""MSOP (Multi-Scale Oriented Patches) detector.

Re-design of the reference's MSOP path (features.py:102-156, 204-212):
a 4-level Harris pyramid with 3x3 local maxima, SSC adaptive non-maximal
suppression (Bailo et al. 2018) for homogeneous keypoint coverage, and
oriented, blurred 8x8 patch descriptors.

Device work (Harris response, max filter, pyramid, patch warps) runs through
the ops library; the SSC binary search is inherently sequential host logic
(SURVEY.md §7 hard part #6) and stays in numpy.
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from pano360_tpu.ops.filters import (gaussian_blur, feature_ksize,
                                     harris_response, max_pool3x3, pyr_down,
                                     sobel)
from pano360_tpu.ops.warp import warp_perspective
from pano360_tpu.ops.color import bgr2gray

DSIZE = 8          # descriptor size (features.py:16)
MAX_FEAT = (5000, 100, 25, 10)   # per-level budgets (features.py:133)


# ---------------------------------------------------------------------------
# SSC adaptive non-maximal suppression (features.py:28-99 re-implementation)
# ---------------------------------------------------------------------------

def ssc(keypoints: np.ndarray, im_size: Tuple[int, int], n_points: int,
        tol: float = 0.1) -> np.ndarray:
    """Pick ~n_points spatially homogeneous keypoints (score-ordered input).

    Binary search over the suppression radius; each trial greedily keeps
    points whose grid cell is uncovered and covers a square of the current
    radius around them. Returns indices into ``keypoints``.
    """
    cols, rows = im_size
    n_kpts = len(keypoints)
    if n_kpts <= n_points:
        return np.arange(n_kpts)

    # upper bound on the radius from the closed-form solution of
    # (rows+w)(cols+w) / (w/2)^2 = n_points
    exp1 = rows + cols + 2 * n_points
    exp2 = (4 * cols + 4 * n_points + 4 * rows * n_points + rows * rows
            + cols * cols - 2 * rows * cols + 4 * rows * cols * n_points)
    exp3 = math.sqrt(max(exp2, 0))
    exp4 = max(n_points - 1, 1)
    high = max(-round((exp1 + exp3) / exp4), -round((exp1 - exp3) / exp4))
    low = math.floor(math.sqrt(n_kpts / n_points))

    k_min = round(n_points - n_points * tol)
    k_max = round(n_points + n_points * tol)

    prev_width = -1
    result = np.arange(min(n_kpts, n_points))
    while True:
        width = low + (high - low) / 2
        if width == prev_width or low > high:
            break
        cgr = width / 2
        n_cc = int(cols / cgr)
        n_cr = int(rows / cgr)
        covered = np.zeros((n_cr + 1, n_cc + 1), bool)
        sel = []
        span = int(width / cgr)
        for i in range(n_kpts):
            row = int(keypoints[i, 1] / cgr)
            col = int(keypoints[i, 0] / cgr)
            if not covered[row, col]:
                sel.append(i)
                r0, r1 = max(row - span, 0), min(row + span, n_cr)
                c0, c1 = max(col - span, 0), min(col + span, n_cc)
                covered[r0:r1 + 1, c0:c1 + 1] = True
        if k_min <= len(sel) <= k_max:
            result = np.asarray(sel)
            break
        if len(sel) < k_min:
            high = width - 1
        else:
            low = width + 1
        prev_width = width
        result = np.asarray(sel)
    return np.asarray(result)


# ---------------------------------------------------------------------------
# Oriented patch descriptors
# ---------------------------------------------------------------------------

def _rot_mat_np(theta: float, yx: np.ndarray) -> np.ndarray:
    """2-D rotation+translation matrix (features.py:102-106 convention)."""
    sin, cos = np.sin(theta), np.cos(theta)
    return np.array([[cos, sin, yx[1]], [-sin, cos, yx[0]], [0, 0, 1]],
                    np.float32)


@jax.jit
def _msop_maps(gray: jnp.ndarray):
    """Gradient-orientation and blurred maps for one pyramid level."""
    gx = gaussian_blur(sobel(gray, 1, 0), 1.0, feature_ksize(1.0))
    gy = gaussian_blur(sobel(gray, 0, 1), 1.0, feature_ksize(1.0))
    blurred = gaussian_blur(gray, 2.0, feature_ksize(2.0))
    hrs = harris_response(gray)
    locmax = max_pool3x3(hrs) == hrs
    return gx, gy, blurred, hrs, locmax


@jax.jit
def _patch_descriptors(blurred: jnp.ndarray, rmats: jnp.ndarray):
    """8x8 oriented patches via batched perspective warps -> (N, 64)."""
    def one(rm):
        tile = warp_perspective(blurred, rm, (DSIZE, DSIZE),
                                border="constant")
        return tile.reshape(-1)
    desc = jax.vmap(one)(rmats)
    mean = jnp.mean(desc, axis=1, keepdims=True)
    std = jnp.std(desc, axis=1, keepdims=True)
    return (desc - mean) / (std + 1e-8)


def msop_extract_host(img_bgr: np.ndarray,
                      max_feat: Sequence[int] = MAX_FEAT):
    """Extract MSOP keypoints + 64-d descriptors for one image.

    Returns ``(kpts (N, 2) float32 full-res (x, y), desc (N, 64))``.
    """
    gray = np.asarray(bgr2gray(
        jnp.asarray(img_bgr.astype(np.float32))))  # 0..255 scale
    points, descs = [], []

    cur = jnp.asarray(gray)
    for lvl, maxf in enumerate(max_feat):
        gx, gy, blurred, hrs, locmax = _msop_maps(cur)
        hrs_np = np.asarray(hrs)
        rows, cols = np.where(np.asarray(locmax))
        order = np.argsort(hrs_np[rows, cols])[-maxf * 20:]
        rows, cols = rows[order][::-1], cols[order][::-1]  # best first

        sel = ssc(np.stack([cols, rows], axis=1).astype(np.float32),
                  hrs_np.shape[::-1], maxf)
        rows, cols = rows[sel], cols[sel]

        gx_np, gy_np = np.asarray(gx), np.asarray(gy)
        thetas = np.arctan2(gx_np[rows, cols], gy_np[rows, cols])
        scale = 2.0 ** lvl
        rmats = []
        for r, c, th in zip(rows, cols, thetas):
            rm = np.linalg.inv(_rot_mat_np(th, np.array([r, c])))
            rm[:2, 2] += DSIZE / 2
            rmats.append(rm)
        if rmats:
            desc = np.asarray(_patch_descriptors(
                blurred, jnp.asarray(np.stack(rmats), jnp.float32)))
            descs.append(desc)
            points.append(np.stack([cols * scale, rows * scale],
                                   axis=1).astype(np.float32))
        cur = pyr_down(cur)

    if not points:
        return np.zeros((0, 2), np.float32), np.zeros((0, 64), np.float32)
    return np.concatenate(points), np.concatenate(descs)


__all__ = ["DSIZE", "MAX_FEAT", "ssc", "msop_extract_host"]
