"""Fused Pallas kernel for one SIFT octave's Gaussian stack + DoG.

The production scale-space (features/sift.py ``_gaussian_stack``,
replacing the reference's per-layer ``cv2.GaussianBlur`` chain,
features.py:23-26) is a SEQUENTIAL chain of 2*(S+2) separable blur
passes; under XLA every pass round-trips HBM (pad -> row conv -> pad ->
col conv per layer), and the DoG subtraction re-reads the whole stack.
At bench scale that is ~20 full-image HBM traffics per octave for work
whose arithmetic is trivial — the stage is pure bandwidth.

This kernel computes the ENTIRE octave in one pass: each grid step DMAs
one (TILE+2*halo) window of the octave base into VMEM, runs the full
incremental blur chain on the VPU (identical taps, identical
left-to-right accumulation order as ``ops.filters._conv_axis``, so the
interior is bit-comparable to the XLA chain), and writes all S+3
Gaussian layers AND all S+2 DoG layers for its tile. HBM traffic drops
to ~1 read + (2S+5) writes of the octave — a ~2x reduction — and the
chain's serialization disappears behind the pipeline.

Border semantics: the base is reflect101-padded ONCE (in XLA, before
the call); the cv2 chain instead re-reflects every LAYER at the image
edge. The two agree except within ``halo`` (~41 px) of the image
border, where the difference is bounded by the blur of the
reflect-vs-reblur residual (measured ~1e-3; the interior is exact to
f32 rounding). Downstream parity is gated the same way the direct mode
was: keypoint-overlap + GT-registration tests, plus the real-texture
A/B harness (benchmarks/ab_real_quality.py).

Shifted reads are expressed with ``pltpu.roll`` (circular): wraparound
contaminates only sum(halves) <= halo rows/lanes at the window edge,
which the center crop discards by construction.
"""
from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Y = 256
TILE_X = 256
HALO_X = 128                 # one lane tile: keeps every slice lane-aligned


def chain_taps(sigma: float, n_layers: int) -> Tuple[Tuple[float, ...], ...]:
    """The incremental chain's per-layer 1-D taps (static, f32).

    Same rule as ``features.sift._gaussian_stack`` + ``_cv2_sift_ksize``
    and ``ops.filters.gaussian_kernel1d`` (cv2.getGaussianKernel in f64,
    normalized, cast f32).
    """
    s = n_layers
    k = 2.0 ** (1.0 / s)
    sigs = [sigma * (k ** i) for i in range(s + 3)]
    out = []
    for i in range(1, s + 3):
        d = math.sqrt(sigs[i] ** 2 - sigs[i - 1] ** 2)
        ks = int(round(d * 4 * 2 + 1)) | 1
        x = np.arange(ks, dtype=np.float64) - (ks - 1) / 2.0
        g = np.exp(-(x * x) / (2.0 * d * d))
        out.append(tuple((g / g.sum()).astype(np.float32).tolist()))
    return tuple(out)


def chain_halo(taps: Sequence[Sequence[float]]) -> int:
    """Cumulative half-extent of the chained convolutions."""
    return sum(len(t) // 2 for t in taps)


def eligible(h: int, w: int, taps) -> bool:
    """Kernel pays off (and reflect-pads legally) only on big octaves."""
    halo = chain_halo(taps)
    return (h >= TILE_Y and w >= TILE_X
            and halo < min(h, w)
            and _halo_y(taps) <= TILE_Y and halo <= HALO_X)


def _halo_y(taps) -> int:
    return -(-chain_halo(taps) // 8) * 8          # sublane-aligned halo


def band_matrices(taps, win_x: int) -> np.ndarray:
    """(n_lay, win_x, win_x) banded matrices: B[l][r, c] = tap_l[c-r+h].

    ``x @ B`` is the lane-axis correlation with zero fill at the window
    edge (the fill stays inside the halo the center crop discards).
    """
    n_lay = len(taps)
    out = np.zeros((n_lay, win_x, win_x), np.float32)
    for li, t in enumerate(taps):
        h = len(t) // 2
        for ti, v in enumerate(t):
            d = ti - h
            idx = np.arange(max(0, -d), min(win_x, win_x - d))
            out[li, idx, idx + d] = v
    return out


def _make_kernel(taps, hy: int, win_y: int, win_x: int, score_cfg=None):
    n_lay = len(taps)

    def roll(a, dy, dx):
        """a[y+dy, x+dx] via circular shifts (wraparound stays in the
        halo the center crop discards)."""
        out = a
        if dy:
            out = pltpu.roll(out, (-dy) % win_y, 0)
        if dx:
            out = pltpu.roll(out, (-dx) % win_x, 1)
        return out

    def kernel(base_ref, band_ref, *refs):
        if score_cfg is None:
            gauss_ref, dog_ref, win, sem = refs
            dogs = None
        else:
            gauss_ref, dog_ref, score_ref, win, dogs, sem = refs
        i = pl.program_id(1)
        j = pl.program_id(2)
        oy = pl.multiple_of(i * TILE_Y, 8)
        ox = pl.multiple_of(j * TILE_X, 128)
        dma = pltpu.make_async_copy(
            base_ref.at[pl.program_id(0), pl.ds(oy, win_y),
                        pl.ds(ox, win_x)],
            win, sem)
        dma.start()
        dma.wait()

        def center(a):
            return a[hy:hy + TILE_Y, HALO_X:HALO_X + TILE_X]

        cur = win[:]
        prev = cur
        gauss_ref[0, 0] = center(cur)
        for li in range(n_lay):
            t = taps[li]
            h = len(t) // 2
            # vertical: ascending-tap roll accumulation (sublane shifts
            # are cheap VPU moves; the op order matches
            # ops.filters._conv_axis). Circular wraparound stays inside
            # the halo the center crop discards.
            acc = None
            for ti in range(len(t)):
                term = pltpu.roll(cur, (h - ti) % win_y, 0) * t[ti]
                acc = term if acc is None else acc + term
            # horizontal: one banded MXU matmul instead of ~25 lane
            # rotations (the lane-axis rolls dominated the first cut of
            # this kernel: gauss prefix 0.126 s rolled vs 0.155 s XLA).
            # HIGHEST precision keeps it f32-exact to ~1 ulp.
            cur = jnp.dot(acc, band_ref[li],
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
            d = cur - prev
            gauss_ref[0, li + 1] = center(cur)
            dog_ref[0, li] = center(d)
            if dogs is not None:
                dogs[li] = d
            prev = cur

        if score_cfg is None:
            return

        # ---- fused extrema score (the dense half of sift's
        # _octave_candidates): 26-neighbour max/min + threshold +
        # integer-position curvature pre-filter + image-border mask,
        # all while the full DoG windows are VMEM-resident. Separable
        # 3x3x3 reduction: x-shifts then y-shifts per layer, then the
        # layer triple.
        thresh, r, border, h_img, w_img = score_cfg
        mxy, mny = [], []
        for li in range(n_lay):
            d = dogs[li]
            rx = jnp.maximum(jnp.maximum(roll(d, 0, 1), roll(d, 0, -1)), d)
            nx = jnp.minimum(jnp.minimum(roll(d, 0, 1), roll(d, 0, -1)), d)
            mxy.append(jnp.maximum(
                jnp.maximum(roll(rx, 1, 0), roll(rx, -1, 0)), rx))
            mny.append(jnp.minimum(
                jnp.minimum(roll(nx, 1, 0), roll(nx, -1, 0)), nx))

        gy = lax.broadcasted_iota(jnp.int32, (TILE_Y, TILE_X), 0) \
            + i * TILE_Y
        gx = lax.broadcasted_iota(jnp.int32, (TILE_Y, TILE_X), 1) \
            + j * TILE_X
        in_border = ((gy >= border) & (gy < h_img - border)
                     & (gx >= border) & (gx < w_img - border))

        for li in range(1, n_lay - 1):
            cm = dogs[li]
            mx = jnp.maximum(jnp.maximum(mxy[li - 1], mxy[li + 1]), mxy[li])
            mn = jnp.minimum(jnp.minimum(mny[li - 1], mny[li + 1]), mny[li])
            is_ext = (((cm >= mx) & (cm > thresh))
                      | ((cm <= mn) & (cm < -thresh)))
            sxp, sxm = roll(cm, 0, 1), roll(cm, 0, -1)
            syp, sym = roll(cm, 1, 0), roll(cm, -1, 0)
            dxx = sxp - 2.0 * cm + sxm
            dyy = syp - 2.0 * cm + sym
            dxy = (roll(cm, 1, 1) - roll(cm, 1, -1)
                   - roll(cm, -1, 1) + roll(cm, -1, -1)) * 0.25
            tr = dxx + dyy
            det = dxx * dyy - dxy * dxy
            edge_ok = (det > 0) & (tr * tr * r < (r + 1.0) ** 2 * det)
            sc = jnp.where(is_ext & edge_ok, jnp.abs(cm), 0.0)
            score_ref[0, li - 1] = jnp.where(in_border, center(sc), 0.0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("taps", "score_cfg", "interpret"))
def octave_stack(base: jnp.ndarray, taps, score_cfg=None,
                 interpret: bool = False):
    """(N, H, W) f32 octave base -> (gauss (N, S+3, H, W),
    dog (N, S+2, H, W)[, score (N, S, H, W)]) via one fused Pallas pass.

    ``taps``: static per-layer 1-D kernels from ``chain_taps``.
    ``score_cfg``: optional static (thresh, edge_thresh, border) — when
    given, the kernel also emits the DoG extrema candidate score map
    (the dense half of sift's ``_octave_candidates``) so the DoG stack
    is never re-read from HBM for candidate detection.
    """
    n, h, w = base.shape
    n_lay = len(taps)
    hy = _halo_y(taps)
    nty = -(-h // TILE_Y)
    ntx = -(-w // TILE_X)
    win_y = TILE_Y + 2 * hy
    win_x = TILE_X + 2 * HALO_X

    halo = chain_halo(taps)
    # reflect101 halo first (legal: halo < min(h, w)), then edge-fill to
    # the tiled extent — the fill region only ever feeds tile centers
    # that lie beyond (h, w) and are cropped below
    pad = jnp.pad(base, ((0, 0), (hy, hy), (HALO_X, HALO_X)),
                  mode="reflect")
    tr_y = nty * TILE_Y + 2 * hy - pad.shape[1]
    tr_x = ntx * TILE_X + 2 * HALO_X - pad.shape[2]
    if tr_y or tr_x:
        pad = jnp.pad(pad, ((0, 0), (0, tr_y), (0, tr_x)), mode="edge")

    bands = jnp.asarray(band_matrices(taps, win_x))

    out_specs = [
        pl.BlockSpec((1, n_lay + 1, TILE_Y, TILE_X),
                     lambda nn, i, j: (nn, 0, i, j)),
        pl.BlockSpec((1, n_lay, TILE_Y, TILE_X),
                     lambda nn, i, j: (nn, 0, i, j)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n, n_lay + 1, nty * TILE_Y, ntx * TILE_X),
                             jnp.float32),
        jax.ShapeDtypeStruct((n, n_lay, nty * TILE_Y, ntx * TILE_X),
                             jnp.float32),
    ]
    scratch = [pltpu.VMEM((win_y, win_x), jnp.float32)]
    kern_cfg = None
    if score_cfg is not None:
        thresh, edge_r, border = score_cfg
        kern_cfg = (float(thresh), float(edge_r), int(border), h, w)
        out_specs.append(
            pl.BlockSpec((1, n_lay - 2, TILE_Y, TILE_X),
                         lambda nn, i, j: (nn, 0, i, j)))
        out_shape.append(
            jax.ShapeDtypeStruct((n, n_lay - 2, nty * TILE_Y, ntx * TILE_X),
                                 jnp.float32))
        # full DoG windows stay resident for the 3x3x3 extrema pass
        scratch.append(pltpu.VMEM((n_lay, win_y, win_x), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n, nty, ntx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  # grid-invariant block: stays VMEM-resident across steps
                  pl.BlockSpec((n_lay, win_x, win_x),
                               lambda nn, i, j: (0, 0, 0))],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        _make_kernel(taps, hy, win_y, win_x, score_cfg=kern_cfg),
        grid_spec=grid_spec,
        # the unrolled roll-accumulate chain + double-buffered output
        # blocks need ~16.4 MB of scoped VMEM (+~4 MB for the resident
        # DoG windows in score mode) — past the compiler's conservative
        # 16 MB default (v5e has 128 MB physical VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        out_shape=out_shape,
        interpret=interpret,
    )(pad, bands)
    return tuple(o[:, :, :h, :w] for o in outs)


__all__ = ["octave_stack", "chain_taps", "chain_halo", "eligible",
           "TILE_Y", "TILE_X"]
