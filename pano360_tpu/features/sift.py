"""Batched SIFT feature extraction in pure JAX.

TPU-native replacement for the reference's OpenCV SIFT
(``features.py:192-201`` -> ``cv2.xfeatures2d.SIFT``): the Gaussian
scale-space, DoG pyramid, 26-neighbour extrema detection, iterative subpixel
refinement, contrast/edge rejection, orientation histograms and 128-d
descriptors are all expressed as statically shaped XLA programs batched over
images. Keypoint buffers are fixed-capacity with validity masks (SURVEY.md §7
hard part #2).

Algorithmic parity follows OpenCV's SIFT (Lowe 2004):

- base image upscaled 2x, assumed camera blur 0.5, base sigma 1.6;
- ``n_layers`` (3) scales per octave, S+3 Gaussian / S+2 DoG images;
- extrema: |DoG| > 0.5*contrast_thresh/S and 26-neighbour max/min;
- up to 5 Newton iterations of subpixel refinement with integer re-centering,
  contrast (|c|*S >= CT) and edge (tr^2/det < (r+1)^2/r, r=10) tests;
- orientation: 36-bin gradient histogram over an exact integer-pixel window
  of radius round(4.5 sigma), Gaussian-weighted, 5-tap smoothed, up to 2
  peaks >= 0.8*max (cv2-style duplication);
- descriptor: 4x4x8 trilinear binning over a rotated 16x16 sample grid
  (sigma-scaled; the one deliberate deviation from cv2's dense integer
  window -- standard for vectorized SIFT, parity is judged downstream on
  match graphs / mosaics per SURVEY.md §7 hard part #1);
- RootSIFT normalization (features.py:198) is applied by the caller.

Keypoint coordinates are returned in original-image pixels.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from pano360_tpu.ops.filters import gaussian_blur
from pano360_tpu.ops.resize import resize_bilinear


@dataclasses.dataclass(frozen=True)
class SiftConfig:
    n_layers: int = 3            # scales per octave (cv2 nOctaveLayers)
    sigma: float = 1.6           # base blur
    init_sigma: float = 0.5      # assumed camera blur
    contrast_thresh: float = 0.04
    edge_thresh: float = 10.0
    upscale: bool = True         # cv2 firstOctave = -1
    max_kpts: int = 4096         # global keypoint capacity
    img_border: int = 5          # SIFT_IMG_BORDER
    refine_iters: int = 5
    n_orientations: int = 2      # duplicated keypoints per extra peak
    ori_bins: int = 36
    ori_radius: int = 16         # max integer window radius (sigma<=3.6)
    descr_width: int = 4         # 4x4 spatial bins
    descr_ori_bins: int = 8
    descr_samples: int = 16      # 16x16 rotated sample grid
    descr_mag_thresh: float = 0.2

    @property
    def dim(self) -> int:
        return self.descr_width * self.descr_width * self.descr_ori_bins


class SiftFeatures(NamedTuple):
    """Fixed-capacity keypoint set for a batch of images."""

    xy: jnp.ndarray        # (N, K, 2) float32, original-image pixels
    size: jnp.ndarray      # (N, K) keypoint diameter (cv2 .size convention)
    angle: jnp.ndarray     # (N, K) orientation in radians
    response: jnp.ndarray  # (N, K) |contrast|
    desc: jnp.ndarray      # (N, K, 128) float32
    valid: jnp.ndarray     # (N, K) bool


# ---------------------------------------------------------------------------
# Scale space
# ---------------------------------------------------------------------------

def _blur_nhw(img: jnp.ndarray, sigma: float, ksize: int) -> jnp.ndarray:
    """Gaussian blur of a (N, H, W) stack over the two *trailing* axes.

    ``gaussian_blur`` interprets 3-D arrays as (H, W, C); route through the
    unambiguous 4-D layout so the batch axis is never convolved.
    """
    return gaussian_blur(img[..., None], sigma, ksize)[..., 0]


def _base_image(gray: jnp.ndarray, cfg: SiftConfig) -> jnp.ndarray:
    """(N, H, W) gray -> base image with blur sigma (upscaled 2x if set)."""
    n, h, w = gray.shape
    if cfg.upscale:
        img = jax.vmap(lambda im: resize_bilinear(im, (2 * h, 2 * w)))(gray)
        cur = cfg.init_sigma * 2.0
    else:
        img = gray
        cur = cfg.init_sigma
    delta = math.sqrt(max(cfg.sigma ** 2 - cur ** 2, 0.01))
    return _blur_nhw(img, delta, _cv2_sift_ksize(delta))


def _cv2_sift_ksize(sigma: float) -> int:
    """cv2 SIFT blurs with GaussianBlur auto kernel size on float images."""
    return int(round(sigma * 4 * 2 + 1)) | 1


def n_octaves_for(shape: Tuple[int, int], upscale: bool) -> int:
    """cv2: actualNOctaves = round(log2(min(H, W))) - 2 (+1 if upscaled)."""
    side = min(shape)
    if upscale:
        side *= 2
    return max(int(round(math.log2(side))) - 2, 1)


def _gaussian_stack(base: jnp.ndarray, cfg: SiftConfig) -> jnp.ndarray:
    """One octave's Gaussian images: (N, H, W) -> (N, S+3, H, W)."""
    s = cfg.n_layers
    k = 2.0 ** (1.0 / s)
    sigs = [cfg.sigma * (k ** i) for i in range(s + 3)]
    imgs = [base]
    for i in range(1, s + 3):
        delta = math.sqrt(sigs[i] ** 2 - sigs[i - 1] ** 2)
        imgs.append(_blur_nhw(imgs[-1], delta, _cv2_sift_ksize(delta)))
    return jnp.stack(imgs, axis=1)


# ---------------------------------------------------------------------------
# Extrema detection
# ---------------------------------------------------------------------------

def _octave_candidates(dog: jnp.ndarray, cfg: SiftConfig, cap: int):
    """Top-`cap` DoG extrema per image. dog: (N, S+2, H, W).

    Returns (layer, y, x, score_valid) each (N, cap) int32/bool.
    """
    n, nl, h, w = dog.shape
    s = cfg.n_layers
    thresh = 0.5 * cfg.contrast_thresh / s

    mx = lax.reduce_window(dog, -jnp.inf, lax.max, (1, 3, 3, 3),
                           (1, 1, 1, 1),
                           [(0, 0), (0, 0), (1, 1), (1, 1)])
    mn = lax.reduce_window(dog, jnp.inf, lax.min, (1, 3, 3, 3),
                           (1, 1, 1, 1),
                           [(0, 0), (0, 0), (1, 1), (1, 1)])
    center = dog[:, 1:-1]
    is_ext = ((center >= mx[:, 1:-1]) & (center > thresh)) | \
             ((center <= mn[:, 1:-1]) & (center < -thresh))

    b = cfg.img_border
    ys = jnp.arange(h)[None, None, :, None]
    xs = jnp.arange(w)[None, None, None, :]
    in_border = (ys >= b) & (ys < h - b) & (xs >= b) & (xs < w - b)
    is_ext = is_ext & in_border

    # dense edge pre-filter: the same principal-curvature ratio test that
    # refinement applies, evaluated at integer positions, so the fixed
    # candidate budget is not wasted on edge responses that would be
    # rejected later anyway (they dominate raw |DoG| ranking).
    dxx = center[..., :, 2:] - 2 * center[..., :, 1:-1] + center[..., :, :-2]
    dyy = center[..., 2:, :] - 2 * center[..., 1:-1, :] + center[..., :-2, :]
    dxy = (center[..., 2:, 2:] - center[..., 2:, :-2]
           - center[..., :-2, 2:] + center[..., :-2, :-2]) * 0.25
    dxx = jnp.pad(dxx, ((0, 0), (0, 0), (0, 0), (1, 1)))
    dyy = jnp.pad(dyy, ((0, 0), (0, 0), (1, 1), (0, 0)))
    dxy = jnp.pad(dxy, ((0, 0), (0, 0), (1, 1), (1, 1)))
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = cfg.edge_thresh
    edge_ok = (det > 0) & (tr * tr * r < (r + 1) ** 2 * det)
    is_ext = is_ext & edge_ok

    score = jnp.where(is_ext, jnp.abs(center), 0.0)
    flat = score.reshape(n, s * h * w)
    cap = min(cap, s * h * w)
    top, idx = lax.top_k(flat, cap)
    layer = idx // (h * w) + 1
    rem = idx % (h * w)
    return (layer.astype(jnp.int32), (rem // w).astype(jnp.int32),
            (rem % w).astype(jnp.int32), top > 0)


# ---------------------------------------------------------------------------
# Subpixel refinement
# ---------------------------------------------------------------------------

def _gather_cube(dog: jnp.ndarray, l, y, x):
    """3x3x3 neighbourhood of (l, y, x) from (S+2, H, W). Returns (3,3,3)."""
    nl, h, w = dog.shape
    dl = jnp.arange(-1, 2)
    cube_idx = ((l + dl[:, None, None]) * (h * w)
                + (y + dl[None, :, None]) * w
                + (x + dl[None, None, :]))
    return dog.reshape(-1)[cube_idx]


def _refine_one(dog: jnp.ndarray, l0, y0, x0, cfg: SiftConfig):
    """Iterative Newton refinement of one candidate (cv2-style).

    dog: (S+2, H, W). Returns (l, y, x int final, offs (3,), contrast,
    ok bool).
    """
    nl, h, w = dog.shape
    s = cfg.n_layers
    b = cfg.img_border

    def deriv(c):
        dd = jnp.array([
            (c[1, 1, 2] - c[1, 1, 0]) * 0.5,
            (c[1, 2, 1] - c[1, 0, 1]) * 0.5,
            (c[2, 1, 1] - c[0, 1, 1]) * 0.5,
        ])
        dxx = c[1, 1, 2] - 2 * c[1, 1, 1] + c[1, 1, 0]
        dyy = c[1, 2, 1] - 2 * c[1, 1, 1] + c[1, 0, 1]
        dss = c[2, 1, 1] - 2 * c[1, 1, 1] + c[0, 1, 1]
        dxy = (c[1, 2, 2] - c[1, 2, 0] - c[1, 0, 2] + c[1, 0, 0]) * 0.25
        dxs = (c[2, 1, 2] - c[2, 1, 0] - c[0, 1, 2] + c[0, 1, 0]) * 0.25
        dys = (c[2, 2, 1] - c[2, 0, 1] - c[0, 2, 1] + c[0, 0, 1]) * 0.25
        hess = jnp.array([[dxx, dxy, dxs],
                          [dxy, dyy, dys],
                          [dxs, dys, dss]])
        return dd, hess, (dxx, dyy, dxy)

    def body(state, _):
        l, y, x, _, _, moved = state
        c = _gather_cube(dog, l, y, x)
        dd, hess, _ = deriv(c)
        # solve hess @ offs = -dd via closed-form 3x3 inverse
        det = jnp.linalg.det(hess)
        offs = jnp.where(
            jnp.abs(det) > 1e-20,
            -jnp.linalg.solve(hess + 1e-12 * jnp.eye(3, dtype=dog.dtype),
                              dd),
            jnp.zeros(3, dog.dtype)).astype(dog.dtype)
        conv = jnp.all(jnp.abs(offs) < 0.5)
        step = jnp.clip(jnp.round(offs), -1, 1).astype(jnp.int32)
        nx = jnp.clip(x + step[0], b, w - 1 - b)
        ny = jnp.clip(y + step[1], b, h - 1 - b)
        nl_ = jnp.clip(l + step[2], 1, s)
        l = jnp.where(conv, l, nl_)
        y = jnp.where(conv, y, ny)
        x = jnp.where(conv, x, nx)
        return (l, y, x, offs, conv, moved | ~conv), None

    init = (l0, y0, x0, jnp.zeros(3, dog.dtype), jnp.asarray(False),
            jnp.asarray(False))
    (l, y, x, offs, conv, _), _ = lax.scan(
        body, init, None, length=cfg.refine_iters)

    c = _gather_cube(dog, l, y, x)
    dd, hess, (dxx, dyy, dxy) = deriv(c)
    offs = jnp.where(conv, offs, jnp.zeros(3, dog.dtype))
    contrast = c[1, 1, 1] + 0.5 * jnp.dot(dd, offs)

    tr = dxx + dyy
    det2 = dxx * dyy - dxy * dxy
    r = cfg.edge_thresh
    edge_ok = (det2 > 0) & (tr * tr * r < (r + 1) ** 2 * det2)
    contrast_ok = jnp.abs(contrast) * s >= cfg.contrast_thresh
    ok = conv & edge_ok & contrast_ok
    return l, y, x, offs, contrast, ok


# ---------------------------------------------------------------------------
# Orientation histogram
# ---------------------------------------------------------------------------

def _orientation_hists(gauss: jnp.ndarray, l, y, x, sig_oct, cfg: SiftConfig):
    """36-bin orientation histogram per candidate (exact integer window).

    gauss: (S+3, H, W) octave Gaussian stack; l, y, x: int32 candidate
    positions; sig_oct: octave-relative sigma per candidate.
    Returns hist (36,) already circularly smoothed.
    """
    nl, h, w = gauss.shape
    r = cfg.ori_radius
    win = 2 * r + 3  # +2 margin for central differences
    dy = jnp.arange(win) - (r + 1)
    dx = jnp.arange(win) - (r + 1)
    yy = jnp.clip(y + dy[:, None], 0, h - 1)
    xx = jnp.clip(x + dx[None, :], 0, w - 1)
    img = gauss.reshape(-1)[l * (h * w) + yy * w + xx]   # (win, win)

    gx = img[1:-1, 2:] - img[1:-1, :-2]
    gy = img[:-2, 1:-1] - img[2:, 1:-1]                  # cv2: prev - next row
    mag = jnp.sqrt(gx * gx + gy * gy)
    ori = jnp.arctan2(gy, gx)                            # radians

    radius = jnp.round(4.5 * sig_oct)
    dyc = dy[1:-1][:, None]
    dxc = dx[1:-1][None, :]
    rr = dyc * dyc + dxc * dxc
    # valid: inside per-kp radius, sample position in-bounds
    yv = (y + dy[1:-1][:, None] >= 1) & (y + dy[1:-1][:, None] <= h - 2)
    xv = (x + dx[1:-1][None, :] >= 1) & (x + dx[1:-1][None, :] <= w - 2)
    inside = (jnp.abs(dyc) <= radius) & (jnp.abs(dxc) <= radius) & yv & xv
    wgt = jnp.exp(rr / (-2.0 * (1.5 * sig_oct) ** 2)) * inside

    nb = cfg.ori_bins
    bins = jnp.round(ori * (nb / (2 * jnp.pi))).astype(jnp.int32) % nb
    hist = jnp.zeros(nb, mag.dtype).at[bins.reshape(-1)].add(
        (mag * wgt).reshape(-1))

    # cv2 circular smoothing: (h[i-2]+h[i+2])/16 + 4(h[i-1]+h[i+1])/16 + 6h/16
    hm2, hm1 = jnp.roll(hist, 2), jnp.roll(hist, 1)
    hp1, hp2 = jnp.roll(hist, -1), jnp.roll(hist, -2)
    return (hm2 + hp2) * (1 / 16) + (hm1 + hp1) * (4 / 16) + hist * (6 / 16)


def _peak_angles(hist: jnp.ndarray, cfg: SiftConfig):
    """Up to ``n_orientations`` interpolated peak angles (radians).

    Returns (angles (n_ori,), valid (n_ori,)).
    """
    nb = cfg.ori_bins
    hm1, hp1 = jnp.roll(hist, 1), jnp.roll(hist, -1)
    mx = jnp.max(hist)
    is_peak = (hist > hm1) & (hist > hp1) & (hist >= 0.8 * mx) & (mx > 0)
    peak_val = jnp.where(is_peak, hist, -jnp.inf)
    vals, idx = lax.top_k(peak_val, cfg.n_orientations)
    denom = hm1[idx] - 2 * hist[idx] + hp1[idx]
    interp = jnp.where(jnp.abs(denom) > 1e-12,
                       0.5 * (hm1[idx] - hp1[idx]) / denom, 0.0)
    bin_pos = (idx + interp) % nb
    angles = bin_pos * (2 * jnp.pi / nb)
    return angles, jnp.isfinite(vals)


# ---------------------------------------------------------------------------
# Descriptor
# ---------------------------------------------------------------------------

def _descriptor(gauss: jnp.ndarray, l, yf, xf, sig_oct, angle,
                cfg: SiftConfig):
    """128-d descriptor for one oriented keypoint (rotated sample grid).

    gauss: (S+3, H, W); yf, xf: refined float positions in octave coords.
    """
    nl, h, w = gauss.shape
    d = cfg.descr_width
    p = cfg.descr_samples
    nob = cfg.descr_ori_bins

    # sample grid in bin units, covering the d x d descriptor window
    g = (jnp.arange(p) + 0.5) / p * d - d / 2          # (-2, 2) for d=4
    gu, gv = jnp.meshgrid(g, g, indexing="xy")          # (p, p)
    cosa, sina = jnp.cos(angle), jnp.sin(angle)
    hist_width = 3.0 * sig_oct                          # SIFT_DESCR_SCL_FCTR
    # rotate into image frame (cv2: c_rot = (c*cos - r*sin) etc.)
    sx = xf + (gu * cosa - gv * sina) * hist_width
    sy = yf + (gu * sina + gv * cosa) * hist_width

    # bilinear gradient sampling from the keypoint's Gaussian layer.
    # NOTE: the layer index is folded into the flat gather offset; selecting
    # the (H, W) layer first (``gauss[l]``) materializes a full image copy
    # per keypoint under vmap (a 40 GB intermediate on TPU).
    flat = gauss.reshape(-1)
    base_off = l * (h * w)

    def bil(qx, qy):
        x0 = jnp.floor(qx).astype(jnp.int32)
        y0 = jnp.floor(qy).astype(jnp.int32)
        fx, fy = qx - x0, qy - y0
        x0c = jnp.clip(x0, 0, w - 1)
        x1c = jnp.clip(x0 + 1, 0, w - 1)
        y0c = jnp.clip(y0, 0, h - 1)
        y1c = jnp.clip(y0 + 1, 0, h - 1)
        v00 = flat[base_off + y0c * w + x0c]
        v01 = flat[base_off + y0c * w + x1c]
        v10 = flat[base_off + y1c * w + x0c]
        v11 = flat[base_off + y1c * w + x1c]
        return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
                + (v10 * (1 - fx) + v11 * fx) * fy)

    gx = bil(sx + 1, sy) - bil(sx - 1, sy)
    gy = bil(sx, sy - 1) - bil(sx, sy + 1)
    inb = (sx >= 1) & (sx <= w - 2) & (sy >= 1) & (sy <= h - 2)

    mag = jnp.sqrt(gx * gx + gy * gy)
    ori = jnp.arctan2(gy, gx) - angle
    ori = jnp.mod(ori, 2 * jnp.pi)

    # Gaussian weight over the window (sigma = 0.5 * d in bin units)
    wgt = jnp.exp(-(gu * gu + gv * gv) / (2 * (0.5 * d) ** 2)) * inb

    # trilinear binning into (d+2, d+2, nob) then crop (cv2 layout)
    rbin = gv + d / 2 - 0.5
    cbin = gu + d / 2 - 0.5
    obin = ori * (nob / (2 * jnp.pi))
    r0 = jnp.floor(rbin).astype(jnp.int32)
    c0 = jnp.floor(cbin).astype(jnp.int32)
    o0 = jnp.floor(obin).astype(jnp.int32)
    fr, fc, fo = rbin - r0, cbin - c0, obin - o0
    o0 = o0 % nob

    acc = jnp.zeros(((d + 2) * (d + 2) * nob), mag.dtype)
    val = (mag * wgt).reshape(-1)
    r0f, c0f = r0.reshape(-1), c0.reshape(-1)
    o0f = o0.reshape(-1)
    frf, fcf, fof = fr.reshape(-1), fc.reshape(-1), fo.reshape(-1)
    for dr in (0, 1):
        wr = jnp.where(dr, frf, 1 - frf)
        rr = jnp.clip(r0f + dr + 1, 0, d + 1)
        for dc in (0, 1):
            wc = jnp.where(dc, fcf, 1 - fcf)
            cc = jnp.clip(c0f + dc + 1, 0, d + 1)
            for do in (0, 1):
                wo = jnp.where(do, fof, 1 - fof)
                oo = (o0f + do) % nob
                idx = (rr * (d + 2) + cc) * nob + oo
                acc = acc.at[idx].add(val * wr * wc * wo)

    acc = acc.reshape(d + 2, d + 2, nob)[1:-1, 1:-1].reshape(-1)

    # normalize, clip, renormalize (cv2)
    nrm = jnp.sqrt(jnp.sum(acc * acc))
    acc = jnp.minimum(acc, cfg.descr_mag_thresh * jnp.maximum(nrm, 1e-12))
    nrm2 = jnp.sqrt(jnp.sum(acc * acc))
    return acc / jnp.maximum(nrm2, 1e-12)


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------

def _octave_caps(cfg: SiftConfig, n_oct: int) -> List[int]:
    caps = []
    for o in range(n_oct):
        caps.append(max(cfg.max_kpts >> o, 128))
    return caps


@functools.partial(jax.jit, static_argnames=("cfg",))
def sift_extract(gray: jnp.ndarray, cfg: SiftConfig = SiftConfig()
                 ) -> SiftFeatures:
    """Extract SIFT keypoints + descriptors from a batch of gray images.

    ``gray``: (N, H, W) float32 in [0, 1]. Returns fixed-capacity
    ``SiftFeatures`` sorted by response (descending) per image.
    """
    n, h0, w0 = gray.shape
    gray = gray.astype(jnp.float32)
    n_oct = n_octaves_for((h0, w0), cfg.upscale)
    caps = _octave_caps(cfg, n_oct)
    s = cfg.n_layers

    base = _base_image(gray, cfg)
    scale0 = 0.5 if cfg.upscale else 1.0  # octave->original coord factor

    outs = []
    octv = base
    for o in range(n_oct):
        gauss = _gaussian_stack(octv, cfg)             # (N, S+3, H, W)
        dog = gauss[:, 1:] - gauss[:, :-1]             # (N, S+2, H, W)
        cap = min(caps[o], s * dog.shape[2] * dog.shape[3])
        l0, y0, x0, cand_ok = _octave_candidates(dog, cfg, cap)

        refine = jax.vmap(jax.vmap(
            lambda dg, a, b, c: _refine_one(dg, a, b, c, cfg),
            in_axes=(None, 0, 0, 0)), in_axes=(0, 0, 0, 0))
        l, y, x, offs, contrast, ok = refine(dog, l0, y0, x0)
        ok = ok & cand_ok

        lf = l.astype(jnp.float32) + offs[..., 2]
        sig_oct = cfg.sigma * jnp.power(2.0, lf / s)
        xf = x.astype(jnp.float32) + offs[..., 0]
        yf = y.astype(jnp.float32) + offs[..., 1]

        ori_fn = jax.vmap(jax.vmap(
            lambda g, a, b, c, sg: _orientation_hists(g, a, b, c, sg, cfg),
            in_axes=(None, 0, 0, 0, 0)), in_axes=(0, 0, 0, 0, 0))
        hists = ori_fn(gauss, l, y, x, sig_oct)        # (N, cap, 36)
        angles, avalid = jax.vmap(jax.vmap(
            lambda hh: _peak_angles(hh, cfg)))(hists)  # (N, cap, n_ori)

        desc_fn = jax.vmap(jax.vmap(jax.vmap(
            lambda g, a, b, c, sg, an: _descriptor(g, a, b, c, sg, an, cfg),
            in_axes=(None, None, None, None, None, 0)),   # orientations
            in_axes=(None, 0, 0, 0, 0, 0)),               # keypoints
            in_axes=(0, 0, 0, 0, 0, 0))                   # batch
        descs = desc_fn(gauss, l, yf, xf, sig_oct, angles)
        # (N, cap, n_ori, 128)

        factor = scale0 * (2.0 ** o)
        no = cfg.n_orientations
        xy = jnp.stack([xf, yf], axis=-1) * factor      # (N, cap, 2)
        size = sig_oct * 2.0 * factor                   # cv2 kp.size
        kp_ok = ok[..., None] & avalid                  # (N, cap, n_ori)

        outs.append(dict(
            xy=jnp.broadcast_to(xy[:, :, None, :], (n, cap, no, 2)
                                ).reshape(n, cap * no, 2),
            size=jnp.broadcast_to(size[:, :, None], (n, cap, no)
                                  ).reshape(n, cap * no),
            angle=angles.reshape(n, cap * no),
            response=jnp.broadcast_to(
                jnp.abs(contrast)[:, :, None], (n, cap, no)
            ).reshape(n, cap * no),
            desc=descs.reshape(n, cap * no, cfg.dim),
            valid=kp_ok.reshape(n, cap * no),
        ))

        if o + 1 < n_oct:
            octv = gauss[:, s][:, ::2, ::2]  # cv2: downsample layer S

    cat = {k: jnp.concatenate([d[k] for d in outs], axis=1) for k in outs[0]}
    # global top-K by response
    score = jnp.where(cat["valid"], cat["response"], -jnp.inf)
    _, sel = lax.top_k(score, cfg.max_kpts)             # (N, K)
    take = jax.vmap(lambda arr, ii: arr[ii])
    return SiftFeatures(
        xy=take(cat["xy"], sel),
        size=take(cat["size"], sel),
        angle=take(cat["angle"], sel),
        response=take(cat["response"], sel),
        desc=take(cat["desc"], sel),
        valid=take(cat["valid"], sel),
    )


def root_sift(desc: jnp.ndarray) -> jnp.ndarray:
    """RootSIFT normalization: sqrt(des / (sum + 1e-7)) (features.py:198)."""
    return jnp.sqrt(desc / (jnp.sum(desc, axis=-1, keepdims=True) + 1e-7))


__all__ = ["SiftConfig", "SiftFeatures", "sift_extract", "root_sift",
           "n_octaves_for"]
