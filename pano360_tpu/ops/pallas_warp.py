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
``plan_windows``. Tiles whose source extent exceeds the caps (heavy
minification, e.g. a MAX_RESOLUTION-capped mosaic of a long sweep)
sample from a coarser level of a 2x box mip pyramid (``build_mips``)
chosen per tile, so the kernel stays eligible at any minification.
Level-0 sampling is exact raw bilinear; mip-sampled tiles are the
standard anti-aliased approximation of it.

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


def _tile_coords(bx, by, rx, ry, mx, my, ty0, tx0, period=None):
    """Mosaic-space coordinates of one output tile (TILE_Y, TILE_X).

    All parameters are scalars (SMEM only permits scalar loads
    in-kernel). ``period``: static full-turn width in pixels for
    periodic (wrap-around) canvases — columns past the seam sample at
    their final mosaic column's azimuth (see render.backward_warp_all).
    """
    # tpu.iota is integer-only; cast after
    yi = lax.broadcasted_iota(jnp.int32, (TILE_Y, TILE_X), 0
                              ).astype(jnp.float32) + ty0
    xi = lax.broadcasted_iota(jnp.int32, (TILE_Y, TILE_X), 1
                              ).astype(jnp.float32) + tx0
    px = xi + bx
    if period is not None:
        px = px - jnp.float32(period) * (px >= period)
    xs = px * rx + mx
    ys = (yi + by) * ry + my
    return xs, ys


def _project(xs, ys, p, w, h, cylindrical: bool = False):
    """Spherical/cylindrical proj2hom + K R matvec + divide + masks
    (stitcher math; the two projections differ only in the middle ray
    coordinate — tan(y) spherical, y cylindrical, geometry.py
    SphProj/CylProj).

    ``p``: the 9 projection-matrix entries as scalars, row-major.
    """
    sx = jnp.sin(xs)
    tx = ys if cylindrical else jnp.tan(ys)
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


def _level_dims(img_shape: Tuple[int, int], lvl: int):
    """(true, padded) dims of mip level ``lvl`` (ceil-halved, then aligned)."""
    h, w = img_shape
    hl = -(-h // (1 << lvl))
    wl = -(-w // (1 << lvl))
    return (hl, wl), ((-(-hl // 8)) * 8, (-(-wl // 128)) * 128)


def plan_windows(projs: np.ndarray, bottoms: np.ndarray,
                 resolution: np.ndarray, range_min: np.ndarray,
                 img_shape: Tuple[int, int], ph: int, pw: int,
                 period: "int | None" = None,
                 cylindrical: bool = False,
                 force_level0: bool = False,
                 max_win: "Tuple[int, int] | None" = None):
    """Per-tile source windows with mip-level selection (host, numpy).

    Returns ``(origins (N, nty, ntx, 3) int32 [y, x, level], eligible,
    win_y, win_x, n_levels)``. Each output tile samples from the coarsest-
    necessary level of a 2x box mip pyramid so that its source window fits
    the static (win_y, win_x) VMEM box even under heavy minification —
    the MAX_RESOLUTION-capped regime the reference defaults to
    (stitcher.py:17,153-155), where a full-resolution window cannot fit.
    Level 0 windows reproduce the exact bilinear semantics; minified
    tiles sample bilinearly within their level (standard mip rendering,
    which *reduces* the aliasing the reference's raw bilinear exhibits).

    ``img_shape`` is the TRUE (h, w); windows are planned against each
    level's (8, 128)-aligned padded dims — the caller builds the matching
    pyramid with ``build_mips``.

    ``force_level0``/``max_win``: measurement knobs (measure_warp.py) —
    plan exact level-0 windows under raised caps so the one-hot
    sampling's O(window-area) cost can be measured in the minified
    regime instead of estimated. ``eligible`` is False if the exact
    need exceeds ``max_win``.
    """
    h, w = img_shape
    n = projs.shape[0]
    nty = -(-ph // TILE_Y)
    ntx = -(-pw // TILE_X)

    max_win_y, max_win_x = max_win if max_win else (MAX_WIN_Y, MAX_WIN_X)
    # max level-0 extent that still fits the caps after alignment slack
    budget_y = max_win_y - 2 * 8
    budget_x = max_win_x - 2 * 128

    # project a coarse grid of tile-corner coordinates per region
    ys = np.arange(nty + 1) * TILE_Y
    xs = np.arange(ntx + 1) * TILE_X
    gy, gx = np.meshgrid(ys, xs, indexing="ij")          # (nty+1, ntx+1)

    origins = np.zeros((n, nty, ntx, 3), np.int32)
    exts = []
    max_lvl = 0
    need = {}
    for k in range(n):
        gxa = gx + bottoms[k, 0]
        if period is not None:
            # periodic canvas: columns past the seam sample at their
            # FINAL mosaic column's azimuth (render.backward_warp_all)
            gxa = gxa - period * (gxa >= period)
        mx = gxa * resolution[0] + range_min[0]
        my = (gy + bottoms[k, 1]) * resolution[1] + range_min[1]
        sxv, cxv = np.sin(mx), np.cos(mx)
        txv = my if cylindrical else np.tan(my)
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
                    origins[k, i, j] = (0, 0, 0)
                    continue
                x0 = float(np.floor(cpx[cval].min()))
                x1 = float(np.ceil(cpx[cval].max()))
                y0 = float(np.floor(cpy[cval].min()))
                y1 = float(np.ceil(cpy[cval].max()))
                # coarsest-necessary mip level for this tile
                lvl = 0
                while (not force_level0
                       and ((y1 - y0) / (1 << lvl) + 2 * MARGIN > budget_y
                            or ((x1 - x0) / (1 << lvl) + 2 * MARGIN
                                > budget_x))):
                    lvl += 1
                max_lvl = max(max_lvl, lvl)
                sy0 = np.floor((y0 + 0.5) / (1 << lvl) - 0.5) - MARGIN
                sx0 = np.floor((x0 + 0.5) / (1 << lvl) - 0.5) - MARGIN
                sy1 = np.ceil((y1 + 0.5) / (1 << lvl) - 0.5) + MARGIN
                sx1 = np.ceil((x1 + 0.5) / (1 << lvl) - 0.5) + MARGIN
                ny, nx = need.get(lvl, (1, 1))
                need[lvl] = (max(ny, int(sy1 - sy0)),
                             max(nx, int(sx1 - sx0)))
                exts.append((k, i, j, sy0, sx0, lvl))

    def round_up(v, m):
        return -(-v // m) * m

    # one static window shape across all tiles/levels: sized by the worst
    # per-level need, grown by one tile of alignment slack, clamped to the
    # largest level-padded dims it must cover
    need_y = max((v[0] for v in need.values()), default=1)
    need_x = max((v[1] for v in need.values()), default=1)
    _, (hp0, wp0) = _level_dims((h, w), 0)
    win_y = min(round_up(need_y, 8) + 8, hp0)
    win_x = min(round_up(need_x, 128) + 128, wp0)
    ok = win_y <= max_win_y and win_x <= max_win_x
    for k, i, j, y0, x0, lvl in exts:
        _, (hpl, wpl) = _level_dims((h, w), lvl)
        max_oy = max(hpl - win_y, 0)
        max_ox = max(wpl - win_x, 0)
        oy = (int(np.clip(y0, 0, max_oy)) // 8) * 8
        ox = (int(np.clip(x0, 0, max_ox)) // 128) * 128
        origins[k, i, j] = (oy, ox, lvl)
    return origins, ok, int(win_y), int(win_x), max_lvl + 1


def _make_warp_kernel(win_y: int, win_x: int, h: int, w: int,
                      n_levels: int, period: "int | None" = None,
                      cylindrical: bool = False):
    """``h``/``w``: TRUE image dims for validity masking (the mip buffers
    themselves are edge-padded to (8, 128) tiling and to the window).
    ``period``: static periodic-canvas width (None = aperiodic)."""
    def _warp_kernel(origin_ref, proj_ref, bottom_ref, res_ref, rmin_ref,
                     *rest):
        mip_refs = rest[:n_levels]
        out_ref, mask_ref, win, sem = rest[n_levels:]
        r = pl.program_id(0)
        ti = pl.program_id(1)
        tj = pl.program_id(2)

        # plan_windows aligns origins to the (8, 128) tiling; tell Mosaic
        # (it cannot prove divisibility of runtime values on its own)
        oy = pl.multiple_of(origin_ref[r, ti, tj, 0], 8)
        ox = pl.multiple_of(origin_ref[r, ti, tj, 1], 128)
        lvl = origin_ref[r, ti, tj, 2]

        # DMA this tile's source window (at its mip level) into VMEM; the
        # level choice is data-dependent, so guard one DMA per level
        for l in range(n_levels):
            @pl.when(lvl == l)
            def _(l=l):
                dma = pltpu.make_async_copy(
                    mip_refs[l].at[r, :, pl.ds(oy, win_y),
                                   pl.ds(ox, win_x)],
                    win, sem)
                dma.start()
                dma.wait()

        p = [proj_ref[r, a, b] for a in range(3) for b in range(3)]
        xs, ys = _tile_coords(bottom_ref[r, 0], bottom_ref[r, 1],
                              res_ref[0, 0], res_ref[0, 1],
                              rmin_ref[0, 0], rmin_ref[0, 1],
                              (ti * TILE_Y).astype(jnp.float32),
                              (tj * TILE_X).astype(jnp.float32),
                              period)
        x_pr, y_pr, invalid = _project(xs, ys, p, w, h, cylindrical)

        # full-res sample position -> mip-level coordinates (pixel-center
        # aligned), then window-relative taps (clamped; see docstring).
        # Scalar select chain instead of exp2: transcendentals are not
        # available on the scalar core.
        scale = jnp.float32(1.0)
        for l in range(1, n_levels):
            scale = jnp.where(lvl == l, jnp.float32(1.0 / (1 << l)), scale)
        px = (x_pr + 0.5) * scale - 0.5 - ox.astype(jnp.float32)
        py = (y_pr + 0.5) * scale - 0.5 - oy.astype(jnp.float32)
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        fx2 = px - x0                                   # (TILE_Y, TILE_X)
        fy2 = py - y0
        x0i = jnp.clip(x0.astype(jnp.int32), 0, win_x - 2)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, win_y - 2)

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


def pad_to_tiling(imgs_planar: jnp.ndarray,
                  min_shape: Tuple[int, int] = (8, 128)) -> jnp.ndarray:
    """Edge-pad (N, 4, H, W) to (8, 128)-aligned H/W (and at least
    ``min_shape``) so DMA window origins can cover the trailing
    rows/columns of unaligned images."""
    h, w = imgs_planar.shape[2:]
    ht = max((-(-h // 8)) * 8, min_shape[0])
    wt = max((-(-w // 128)) * 128, min_shape[1])
    if ht == h and wt == w:
        return imgs_planar
    return jnp.pad(imgs_planar, ((0, 0), (0, 0), (0, ht - h), (0, wt - w)),
                   mode="edge")


@functools.partial(jax.jit, static_argnames=("n_levels", "win_y", "win_x"))
def build_mips(imgs_planar: jnp.ndarray, n_levels: int,
               win_y: int = 8, win_x: int = 128):
    """2x box mip pyramid of an (N, 4, H, W) stack, each level edge-padded
    to (8, 128) tiling and to at least the (win_y, win_x) DMA window.

    A 2x2 box average per level keeps minified sampling closest to the
    reference's raw-bilinear look while bounding each tile's source
    window; levels are ceil-halved so every source pixel stays covered.
    """
    levels = [pad_to_tiling(imgs_planar, (win_y, win_x))]
    cur = imgs_planar
    for _ in range(1, n_levels):
        n, c, h, w = cur.shape
        # ceil-halve via edge-padding to even dims, then 2x2 average
        cur = jnp.pad(cur, ((0, 0), (0, 0), (0, h % 2), (0, w % 2)),
                      mode="edge")
        cur = 0.25 * (cur[:, :, ::2, ::2] + cur[:, :, 1::2, ::2]
                      + cur[:, :, ::2, 1::2] + cur[:, :, 1::2, 1::2])
        levels.append(pad_to_tiling(cur, (win_y, win_x)))
    return levels


@functools.partial(jax.jit,
                   static_argnames=("ph", "pw", "win_y", "win_x",
                                    "img_shape", "interpret", "period",
                                    "cylindrical"))
def pallas_backward_warp(mips, projs, bottoms, resolution, range_min,
                         origins, ph: int, pw: int, win_y: int, win_x: int,
                         img_shape: Tuple[int, int] = None,
                         interpret: bool = False,
                         period: "int | None" = None,
                         cylindrical: bool = False):
    """All-region backward warp via the fused Pallas kernel.

    mips: list of (N, 4, Hl, Wl) float32 RGBA mip levels (planar layout so
    each channel window is a proper (sublane, lane) tile), from
    ``build_mips``; ``img_shape``: the TRUE level-0 (h, w) used for
    validity masks; origins/win_y/win_x: from ``plan_windows``.
    Returns (patches (N, ph, pw, 4), invalid (N, ph, pw)).
    """
    n = mips[0].shape[0]
    true_h, true_w = img_shape if img_shape else mips[0].shape[2:]
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
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * len(mips),  # HBM mips
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
        _make_warp_kernel(win_y, win_x, int(true_h), int(true_w),
                          len(mips), period, cylindrical),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, 4, php, pwp), jnp.float32),
            jax.ShapeDtypeStruct((n, php, pwp), jnp.bool_),
        ],
        # production windows need ~2 MB of scoped VMEM; the raised limit
        # only matters for the forced-exact measurement windows
        # (plan_windows(force_level0=True), up to (4, 512, 1024) f32)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(origins,
      projs.astype(jnp.float32),
      bottoms.astype(jnp.float32),
      resolution.astype(jnp.float32)[None],
      range_min.astype(jnp.float32)[None],
      *mips)

    patches = jnp.moveaxis(out, 1, -1)[:, :ph, :pw]
    return patches, mask[:, :ph, :pw]


__all__ = ["plan_windows", "pallas_backward_warp", "pad_to_tiling",
           "build_mips", "TILE_Y", "TILE_X", "MAX_WIN_Y", "MAX_WIN_X"]
