"""Pallas warp kernel vs XLA gather, in both rendering regimes.

The kernel's one-hot-matmul sampling does O(window area) MXU work per
output row, so its win/loss against the XLA gather is regime-dependent:

- **full-res** (no minification): level-0 windows are tile-sized, the
  sampling is exact raw bilinear, and the DMA-windowed kernel beats the
  element-at-a-time gather.
- **capped** (the reference's MAX_RESOLUTION=1400 default on a wide
  sweep): minification blows the level-0 window past VMEM, the kernel
  must sample a mip pyramid (better-filtered but not bit-parity), and
  the one-hot matmuls scale with the window — the gather wins.

``render.stitch``'s auto policy follows exactly this split (kernel iff
n_levels == 1); this benchmark records the evidence. Writes WARP.json.
"""
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pano360_tpu import render, synth  # noqa: E402
from pano360_tpu import geometry as geo  # noqa: E402
from pano360_tpu.ops import pallas_warp as PW  # noqa: E402
from pano360_tpu.register import PanoImage  # noqa: E402


def gt_regions(n_views, shape, seed):
    imgs, rots, focal = synth.make_views(n_views=n_views, shape=shape,
                                         overlap=0.5, seed=seed)
    intr = np.diag([focal, focal, 1.0])
    return [PanoImage((im * 255).astype(np.uint8), r, intr.copy())
            for im, r in zip(imgs, rots)]


def warp_setup(regions, max_resolution):
    """Everything stitch does before the warp, shared by both paths —
    the PRODUCTION layout (``render.plan_layout``), including periodic
    seam-crossing windows."""
    h, w = regions[0].img.shape[:2]
    imgs = jnp.asarray(np.stack([r.img for r in regions])
                       ).astype(jnp.float32) / 255.0
    homs = np.stack([r.hom() for r in regions])
    ranges = np.asarray(render.proj_img_range_border(
        (h, w), jnp.asarray(homs), unwrapped=True), np.float64)
    for k, reg in enumerate(regions):
        reg.range = (ranges[0][k], ranges[1][k])
    imgs_rgba = render.add_weights(imgs)
    lay = render.plan_layout(regions, ranges, "multiband",
                             max_resolution)
    projs = np.stack([r.proj() for r in regions])
    return (imgs_rgba, projs, lay.bottoms, lay.resolution, lay.im_range,
            lay.ph, lay.pw, (h, w), lay.period)


def time_fn(fn, n_runs=5):
    """Median device time. ``fn`` must return a SMALL array (e.g. a
    checksum) — reading back the 50+ MB patch tensor over the ~86 MB/s
    relay link would swamp the kernel time being measured; a scalar
    readback still forces completion (block_until_ready returns at
    enqueue on this relay)."""
    fn()                      # warm (compile)
    ts = []
    for _ in range(n_runs):
        t0 = time.time()
        np.asarray(fn())
        ts.append(time.time() - t0)
    return float(np.median(ts))


def masked_psnr(a, b, valid):
    """PSNR over valid pixels only: outside the source image both paths
    zero alpha but fill RGB with different (equally arbitrary) border
    values — reflect vs clamp — which the blend never reads."""
    a = np.asarray(a, np.float64)[..., :3]
    b = np.asarray(b, np.float64)[..., :3]
    v = np.asarray(valid)[..., None]
    n = max(int(v.sum()) * 3, 1)
    mse = float(np.sum(np.where(v, (a - b) ** 2, 0.0))) / n
    return float(10 * np.log10(1.0 / max(mse, 1e-12)))


def bench_regime(name, regions, max_resolution, out):
    (imgs_rgba, projs, bottoms, resolution, im_range, ph, pw, hw,
     period) = warp_setup(regions, max_resolution)
    h, w = hw

    xargs = (imgs_rgba, jnp.asarray(projs, jnp.float32),
             jnp.asarray(bottoms, jnp.int32),
             jnp.asarray(resolution, jnp.float32),
             jnp.asarray(im_range[0], jnp.float32))

    @jax.jit
    def xla_sum(imgs_rgba, projs_d, bottoms_d, res_d, rmin_d):
        p, m = render.backward_warp_all(imgs_rgba, projs_d, bottoms_d,
                                        res_d, rmin_d, ph, pw,
                                        period=period)
        return jnp.sum(p), jnp.sum(m)

    t_xla = time_fn(lambda: xla_sum(*xargs)[0])

    origins, ok, win_y, win_x, n_levels = PW.plan_windows(
        projs, bottoms, resolution, im_range[0], (h, w), ph, pw,
        period=period)
    row = {"xla_gather_ms": round(t_xla * 1e3, 1),
           "views": len(regions), "img": [h, w], "patch": [ph, pw],
           "periodic": period is not None,
           "eligible": bool(ok), "n_levels": int(n_levels)}
    if ok:
        planar = jnp.moveaxis(imgs_rgba, -1, 1)
        mips = PW.build_mips(planar, n_levels, win_y, win_x)
        kargs = (jnp.asarray(projs, jnp.float32),
                 jnp.asarray(bottoms, jnp.int32),
                 jnp.asarray(resolution, jnp.float32),
                 jnp.asarray(im_range[0], jnp.float32),
                 jnp.asarray(origins))

        @jax.jit
        def kern_sum(mips, projs_d, bottoms_d, res_d, rmin_d, origins_d):
            p, m = PW.pallas_backward_warp(
                mips, projs_d, bottoms_d, res_d, rmin_d, origins_d,
                ph, pw, win_y, win_x, img_shape=(h, w), period=period)
            return jnp.sum(p), jnp.sum(m)

        t_kern = time_fn(lambda: kern_sum(mips, *kargs)[0])
        p_x, m_x = jax.jit(lambda *a: render.backward_warp_all(
            *a, ph, pw, period=period))(*xargs)
        p_k, _ = PW.pallas_backward_warp(mips, *kargs, ph, pw,
                                         win_y, win_x, img_shape=(h, w),
                                         period=period)
        valid = ~np.asarray(m_x)
        row.update({"pallas_ms": round(t_kern * 1e3, 1),
                    "win": [win_y, win_x],
                    "exact": n_levels == 1,
                    "agreement_db": round(
                        masked_psnr(p_x, p_k, valid), 1),
                    "speedup_vs_gather": round(t_xla / t_kern, 2)})

    if ok and row.get("n_levels", 1) > 1:
        # forced-exact measurement: level-0 windows under raised caps.
        # The one-hot sampling does O(window area) MXU work per output
        # row, so this quantifies (rather than estimates) what exactness
        # costs in the minified regime.
        og_e, ok_e, wy_e, wx_e, _ = PW.plan_windows(
            projs, bottoms, resolution, im_range[0], (h, w), ph, pw,
            period=period, force_level0=True, max_win=(512, 1024))
        erow = {"eligible": bool(ok_e), "win": [int(wy_e), int(wx_e)]}
        if ok_e:
            planar = jnp.moveaxis(imgs_rgba, -1, 1)
            mips_e = PW.build_mips(planar, 1, wy_e, wx_e)
            kargs_e = (jnp.asarray(projs, jnp.float32),
                       jnp.asarray(bottoms, jnp.int32),
                       jnp.asarray(resolution, jnp.float32),
                       jnp.asarray(im_range[0], jnp.float32),
                       jnp.asarray(og_e))

            @jax.jit
            def kern_sum_e(mips, projs_d, bottoms_d, res_d, rmin_d,
                           origins_d):
                p, m = PW.pallas_backward_warp(
                    mips, projs_d, bottoms_d, res_d, rmin_d, origins_d,
                    ph, pw, wy_e, wx_e, img_shape=(h, w), period=period)
                return jnp.sum(p), jnp.sum(m)

            t_e = time_fn(lambda: kern_sum_e(mips_e, *kargs_e)[0])
            p_e, _ = PW.pallas_backward_warp(
                mips_e, *kargs_e, ph, pw, wy_e, wx_e, img_shape=(h, w),
                period=period)
            p_x2, m_x2 = jax.jit(lambda *a: render.backward_warp_all(
                *a, ph, pw, period=period))(*xargs)
            erow.update({
                "pallas_ms": round(t_e * 1e3, 1), "exact": True,
                "agreement_db": round(
                    masked_psnr(p_x2, p_e, ~np.asarray(m_x2)), 1),
                "speedup_vs_gather": round(t_xla / t_e, 2)})
        row["exact_forced"] = erow
        print(json.dumps({name + "_exact_forced": erow}), flush=True)

    out[name] = row
    print(json.dumps({name: row}), flush=True)


def main():
    out = {"backend": jax.default_backend()}
    # full-res regime: mosaic at native sampling, level-0 windows fit
    bench_regime("fullres", gt_regions(6, (600, 800), seed=21),
                 max_resolution=10 ** 6, out=out)
    # capped regime: the reference's MAX_RESOLUTION default on the
    # 15-view flagship scene (the BENCH configuration)
    bench_regime("capped_1400", gt_regions(15, (600, 800), seed=21),
                 max_resolution=render.MAX_RESOLUTION, out=out)
    with open(os.path.join(ROOT, "benchmarks", "WARP.json"), "w") as fid:
        json.dump(out, fid, indent=2)


if __name__ == "__main__":
    main()
