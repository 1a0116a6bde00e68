"""Fused Pallas backward-warp kernel for the render path.

The render's hot loop (stitcher.py:288-319) maps every mosaic pixel through
spherical coordinates into a source image and samples bilinearly. The XLA
implementation (`render.backward_warp_all`) expresses the sampling as a
gather, which TPUs execute element-at-a-time from HBM.

This kernel instead exploits the warp's smoothness: a mosaic tile touches a
*compact* source window, so each grid step

1. DMAs its precomputed source window HBM -> VMEM (double-buffered by the
   pallas pipeline),
2. evaluates the projection math (sin/tan/cos, 3x3 matvec, perspective
   divide, validity masks) densely on the VPU,
3. performs bilinear sampling per output row as ``sum(U * (win @ V))``
   where U/V are (window, TILE_X) one-hot-fraction matrices — dense
   MXU/VPU work instead of gathers (Mosaic supports no lane-dim reshapes
   or arbitrary vector gathers, which dictates this row-wise form).

Measured on v5e at a 6-view full-resolution render: 64 ms vs 113 ms for
the XLA gather path, bit-identical masks, pixel agreement to f32 rounding.

Eligibility: the window is a static (win_y, win_x) box sized by
``plan_windows``; when a tile's true source extent exceeds the caps
(heavy minification, e.g. a MAX_RESOLUTION-capped mosaic of a long
sweep), the caller must use the XLA gather path instead.

Samples whose taps fall outside the window are clamped into it; this is
safe because such pixels are exactly the ones outside the source image,
whose alpha the mask zeroes (the reference's BORDER_REFLECT fill is equally
arbitrary there).
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Y = 32
TILE_X = 128
MAX_WIN_Y = 256          # window caps; plan_windows shrinks to the image
MAX_WIN_X = 512
MARGIN = 8


def _tile_coords(bx, by, rx, ry, mx, my, ty0, tx0):
    """Mosaic-space coordinates of one output tile (TILE_Y, TILE_X).

    All parameters are scalars (SMEM only permits scalar loads in-kernel).
    """
    # tpu.iota is integer-only; cast after
    yi = lax.broadcasted_iota(jnp.int32, (TILE_Y, TILE_X), 0
                              ).astype(jnp.float32) + ty0
    xi = lax.broadcasted_iota(jnp.int32, (TILE_Y, TILE_X), 1
                              ).astype(jnp.float32) + tx0
    xs = (xi + bx) * rx + mx
    ys = (yi + by) * ry + my
    return xs, ys


def _project(xs, ys, p, w, h):
    """Spherical proj2hom + K R matvec + divide + masks (stitcher math).

    ``p``: the 9 projection-matrix entries as scalars, row-major.
    """
    sx = jnp.sin(xs)
    tx = jnp.tan(ys)
    cx = jnp.cos(xs)
    u = p[0] * sx + p[1] * tx + p[2] * cx
    v = p[3] * sx + p[4] * tx + p[5] * cx
    z = p[6] * sx + p[7] * tx + p[8] * cx
    invalid = z < 0
    zsafe = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    x_pr = u / zsafe + w / 2
    y_pr = v / zsafe + h / 2
    invalid |= ((x_pr < 0) | (x_pr > w - 1) | (y_pr < 0) | (y_pr > h - 1))
    return x_pr, y_pr, invalid


def plan_windows(projs: np.ndarray, bottoms: np.ndarray,
                 resolution: np.ndarray, range_min: np.ndarray,
                 img_shape: Tuple[int, int], ph: int, pw: int):
    """Per-tile source-window origins + eligibility (host, numpy).

    Returns ``(origins (N, nty, ntx, 2) int32 [y, x], eligible, win_y,
    win_x)`` where win_y/win_x are the static window dims (rounded to TPU
    tiling, capped by the image and MAX_WIN_*).

    ``img_shape`` is the TRUE (h, w); window placement is planned against
    the (8, 128)-aligned padded dims (``pad_to_tiling``) so unaligned
    images keep their last rows/columns coverable — the caller must pass
    the edge-padded stack to ``pallas_backward_warp``.
    """
    h, w = img_shape
    hp, wp = (-(-h // 8)) * 8, (-(-w // 128)) * 128   # padded dims
    n = projs.shape[0]
    nty = -(-ph // TILE_Y)
    ntx = -(-pw // TILE_X)

    # project a coarse grid of tile-corner coordinates per region
    ys = np.arange(nty + 1) * TILE_Y
    xs = np.arange(ntx + 1) * TILE_X
    gy, gx = np.meshgrid(ys, xs, indexing="ij")          # (nty+1, ntx+1)

    origins = np.zeros((n, nty, ntx, 2), np.int32)
    need_y = need_x = 1
    exts = []
    for k in range(n):
        mx = (gx + bottoms[k, 0]) * resolution[0] + range_min[0]
        my = (gy + bottoms[k, 1]) * resolution[1] + range_min[1]
        sxv, txv, cxv = np.sin(mx), np.tan(my), np.cos(mx)
        p = projs[k]
        u = p[0, 0] * sxv + p[0, 1] * txv + p[0, 2] * cxv
        v = p[1, 0] * sxv + p[1, 1] * txv + p[1, 2] * cxv
        z = p[2, 0] * sxv + p[2, 1] * txv + p[2, 2] * cxv
        zs = np.where(np.abs(z) > 1e-12, z, 1e-12)
        px = np.clip(u / zs + w / 2, -1, w)
        py = np.clip(v / zs + h / 2, -1, h)
        valid = z > 0

        for i in range(nty):
            for j in range(ntx):
                cpx = px[i:i + 2, j:j + 2]
                cpy = py[i:i + 2, j:j + 2]
                cval = valid[i:i + 2, j:j + 2]
                if not cval.any():
                    origins[k, i, j] = (0, 0)
                    continue
                x0 = np.floor(cpx[cval].min()) - MARGIN
                x1 = np.ceil(cpx[cval].max()) + MARGIN
                y0 = np.floor(cpy[cval].min()) - MARGIN
                y1 = np.ceil(cpy[cval].max()) + MARGIN
                need_y = max(need_y, int(y1 - y0))
                need_x = max(need_x, int(x1 - x0))
                exts.append((k, i, j, y0, x0))

    def round_up(v, m):
        return -(-v // m) * m

    # Window origins must land on (8, 128) tiling boundaries for the HBM
    # DMA slice, so round origins down and grow the window by one tile of
    # slack; the window must never extend past the PADDED image (unaligned
    # trailing rows/cols stay coverable because the caller edge-pads).
    win_y = min(round_up(need_y, 8) + 8, hp)
    win_x = min(round_up(need_x, 128) + 128, wp)
    ok = (win_y >= min(need_y + 8, hp) and win_x >= min(need_x + 128, wp)
          and win_y <= MAX_WIN_Y and win_x <= MAX_WIN_X)
    max_oy = hp - win_y
    max_ox = wp - win_x
    for k, i, j, y0, x0 in exts:
        oy = (int(np.clip(y0, 0, max_oy)) // 8) * 8
        ox = (int(np.clip(x0, 0, max_ox)) // 128) * 128
        origins[k, i, j] = (oy, ox)
    return origins, ok, int(win_y), int(win_x)


def _make_warp_kernel(win_y: int, win_x: int, h: int, w: int):
    """``h``/``w``: TRUE image dims for validity masking (the image buffer
    itself may be edge-padded to (8, 128) tiling)."""
    def _warp_kernel(origin_ref, proj_ref, bottom_ref, res_ref, rmin_ref,
                     img_ref, out_ref, mask_ref, win, sem):
        r = pl.program_id(0)
        ti = pl.program_id(1)
        tj = pl.program_id(2)

        # plan_windows aligns origins to the (8, 128) tiling; tell Mosaic
        # (it cannot prove divisibility of runtime values on its own)
        oy = pl.multiple_of(origin_ref[r, ti, tj, 0], 8)
        ox = pl.multiple_of(origin_ref[r, ti, tj, 1], 128)

        # DMA this tile's source window into VMEM
        dma = pltpu.make_async_copy(
            img_ref.at[r, :, pl.ds(oy, win_y), pl.ds(ox, win_x)],
            win, sem)
        dma.start()

        p = [proj_ref[r, a, b] for a in range(3) for b in range(3)]
        xs, ys = _tile_coords(bottom_ref[r, 0], bottom_ref[r, 1],
                              res_ref[0, 0], res_ref[0, 1],
                              rmin_ref[0, 0], rmin_ref[0, 1],
                              (ti * TILE_Y).astype(jnp.float32),
                              (tj * TILE_X).astype(jnp.float32))
        x_pr, y_pr, invalid = _project(xs, ys, p, w, h)

        # window-relative bilinear taps (clamped; see module docstring)
        px = x_pr - ox.astype(jnp.float32)
        py = y_pr - oy.astype(jnp.float32)
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        fx2 = px - x0                                   # (TILE_Y, TILE_X)
        fy2 = py - y0
        x0i = jnp.clip(x0.astype(jnp.int32), 0, win_x - 2)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, win_y - 2)

        dma.wait()
        inv_f = invalid.astype(jnp.float32)
        mask_ref[0] = invalid

        # per output row: bilinear weights as (win, TILE_X) one-hot-fracs
        # built from sublane iota vs a broadcast (1, TILE_X) row — Mosaic
        # supports no lane-dim reshapes, so the flat (npix, win) layout is
        # unavailable; this row form keeps every op a plain 2-D vector op
        # and the sampling itself one (win_y, win_x) @ (win_x, TILE_X)
        # matmul per channel per row.
        rows_i = lax.broadcasted_iota(jnp.int32, (win_y, TILE_X), 0)
        cols_i = lax.broadcasted_iota(jnp.int32, (win_x, TILE_X), 0)
        for t in range(TILE_Y):
            y0r = y0i[t:t + 1, :]
            fyr = fy2[t:t + 1, :]
            x0r = x0i[t:t + 1, :]
            fxr = fx2[t:t + 1, :]
            uu = ((rows_i == y0r).astype(jnp.float32) * (1.0 - fyr)
                  + (rows_i == y0r + 1).astype(jnp.float32) * fyr)
            vv = ((cols_i == x0r).astype(jnp.float32) * (1.0 - fxr)
                  + (cols_i == x0r + 1).astype(jnp.float32) * fxr)
            for c in range(4):
                # full-f32 MXU passes: default (bf16) precision leaves a
                # ~3e-3 sampling noise floor vs the exact gather path
                tc = jnp.dot(win[c], vv,
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
                row = jnp.sum(uu * tc, axis=0, keepdims=True)
                if c == 3:
                    row = row * (1.0 - inv_f[t:t + 1, :])
                out_ref[0, c, t:t + 1, :] = row

    return _warp_kernel


def pad_to_tiling(imgs_planar: jnp.ndarray) -> jnp.ndarray:
    """Edge-pad (N, 4, H, W) to (8, 128)-aligned H/W so DMA window origins
    can cover the trailing rows/columns of unaligned images."""
    h, w = imgs_planar.shape[2:]
    pad_h = (-h) % 8
    pad_w = (-w) % 128
    if pad_h == 0 and pad_w == 0:
        return imgs_planar
    return jnp.pad(imgs_planar, ((0, 0), (0, 0), (0, pad_h), (0, pad_w)),
                   mode="edge")


@functools.partial(jax.jit,
                   static_argnames=("ph", "pw", "win_y", "win_x",
                                    "img_shape", "interpret"))
def pallas_backward_warp(imgs_planar, projs, bottoms, resolution, range_min,
                         origins, ph: int, pw: int, win_y: int, win_x: int,
                         img_shape: Tuple[int, int] = None,
                         interpret: bool = False):
    """All-region backward warp via the fused Pallas kernel.

    imgs_planar: (N, 4, H, W) float32 RGBA (planar layout so each channel
    window is a proper (sublane, lane) tile), H/W (8, 128)-aligned — pass
    through ``pad_to_tiling`` first; ``img_shape``: the TRUE pre-padding
    (h, w) used for validity masks; origins/win_y/win_x: from
    ``plan_windows``. Returns (patches (N, ph, pw, 4), invalid (N, ph, pw)).
    """
    n = imgs_planar.shape[0]
    true_h, true_w = img_shape if img_shape else imgs_planar.shape[2:]
    nty = -(-ph // TILE_Y)
    ntx = -(-pw // TILE_X)
    php = nty * TILE_Y
    pwp = ntx * TILE_X

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, nty, ntx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),    # images stay in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, 4, TILE_Y, TILE_X),
                         lambda r, i, j, *_: (r, 0, i, j)),
            pl.BlockSpec((1, TILE_Y, TILE_X),
                         lambda r, i, j, *_: (r, i, j)),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, win_y, win_x), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    out, mask = pl.pallas_call(
        _make_warp_kernel(win_y, win_x, int(true_h), int(true_w)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, 4, php, pwp), jnp.float32),
            jax.ShapeDtypeStruct((n, php, pwp), jnp.bool_),
        ],
        interpret=interpret,
    )(origins,
      projs.astype(jnp.float32),
      bottoms.astype(jnp.float32),
      resolution.astype(jnp.float32)[None],
      range_min.astype(jnp.float32)[None],
      imgs_planar)

    patches = jnp.moveaxis(out, 1, -1)[:, :ph, :pw]
    return patches, mask[:, :ph, :pw]


__all__ = ["plan_windows", "pallas_backward_warp", "pad_to_tiling",
           "TILE_Y", "TILE_X", "MAX_WIN_Y", "MAX_WIN_X"]
