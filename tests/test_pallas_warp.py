"""Pallas backward-warp kernel vs the XLA gather path (interpret mode).

On CPU the kernel runs through the pallas interpreter — semantics only; the
TPU compile/perf path is exercised by the project verify drives.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; fast subset: -m 'not slow'

from pano360_tpu import render, synth
from pano360_tpu.register import PanoImage
from pano360_tpu.ops import pallas_warp as PW


def _setup(n_views=2, shape=(256, 384), max_resolution=4000, seed=5):
    imgs, rots, focal = synth.make_views(n_views=n_views, shape=shape,
                                         overlap=0.5, seed=seed)
    intr = np.diag([focal, focal, 1.0])
    regions = [PanoImage((im * 255).astype(np.uint8), r, intr.copy())
               for im, r in zip(imgs, rots)]
    h, w = shape
    homs = np.stack([r.hom() for r in regions])
    rmin, rmax = render.proj_img_range_border((h, w), jnp.asarray(homs))
    rmin = np.asarray(rmin, np.float64)
    rmax = np.asarray(rmax, np.float64)
    for k, reg in enumerate(regions):
        reg.range = (rmin[k], rmax[k])
    dev = jnp.asarray(np.stack([r.img for r in regions])
                      ).astype(jnp.float32) / 255
    rgba = render.add_weights(dev)
    resolution, im_range = render.estimate_resolution(regions,
                                                      max_resolution)
    target = (im_range[1] - im_range[0]) / resolution
    mshape = tuple(int(t) for t in np.round(target))[::-1]
    bottoms, tops = [], []
    for reg in regions:
        b = np.round((reg.range[0] - im_range[0]) / resolution)
        t = np.round((reg.range[1] - im_range[0]) / resolution)
        bottoms.append(b.astype(np.int64))
        tops.append(t.astype(np.int64))
    bottoms, tops = np.stack(bottoms), np.stack(tops)
    ph = int((tops[:, 1] - bottoms[:, 1]).max())
    pw = int((tops[:, 0] - bottoms[:, 0]).max())
    ph, pw = min(ph, mshape[0]), min(pw, mshape[1])
    bottoms[:, 0] = np.clip(bottoms[:, 0], 0, mshape[1] - pw)
    bottoms[:, 1] = np.clip(bottoms[:, 1], 0, mshape[0] - ph)
    projs = np.stack([r.proj() for r in regions])
    return (rgba, projs, bottoms, resolution, im_range, (h, w), ph, pw)


class TestPallasWarp:
    def test_matches_xla_path(self):
        rgba, projs, bottoms, resolution, im_range, hw, ph, pw = _setup()
        args = (jnp.asarray(projs, jnp.float32),
                jnp.asarray(bottoms, jnp.int32),
                jnp.asarray(resolution, jnp.float32),
                jnp.asarray(im_range[0], jnp.float32))
        px, ix = render.backward_warp_all(rgba, *args, ph, pw)

        origins, ok, wy, wx, nl = PW.plan_windows(
            projs, bottoms, resolution, im_range[0], hw, ph, pw)
        assert ok, "test scene should be eligible"
        assert nl == 1, "no minification -> single mip level"
        mips = PW.build_mips(jnp.moveaxis(rgba, -1, 1), nl, wy, wx)
        pp, ip = PW.pallas_backward_warp(
            mips, *args, jnp.asarray(origins), ph, pw, wy, wx,
            img_shape=hw, interpret=True)

        ixn, ipn = np.asarray(ix), np.asarray(ip)
        np.testing.assert_array_equal(ixn, ipn)
        val = ~ixn
        diff = np.abs(np.asarray(px)[val] - np.asarray(pp)[val])
        assert diff.max() < 1e-4, diff.max()

    def test_matches_xla_path_unaligned(self):
        """Non-(8,128)-aligned image sizes: trailing rows/cols must still
        be covered (regression for the origin-clipping bug where the last
        h%8 rows / w%128 cols were unreachable)."""
        rgba, projs, bottoms, resolution, im_range, hw, ph, pw = _setup(
            shape=(300, 400), seed=11)
        args = (jnp.asarray(projs, jnp.float32),
                jnp.asarray(bottoms, jnp.int32),
                jnp.asarray(resolution, jnp.float32),
                jnp.asarray(im_range[0], jnp.float32))
        px, ix = render.backward_warp_all(rgba, *args, ph, pw)

        origins, ok, wy, wx, nl = PW.plan_windows(
            projs, bottoms, resolution, im_range[0], hw, ph, pw)
        assert ok, "unaligned test scene should be eligible"
        mips = PW.build_mips(jnp.moveaxis(rgba, -1, 1), nl, wy, wx)
        assert mips[0].shape[2] % 8 == 0 and mips[0].shape[3] % 128 == 0
        pp, ip = PW.pallas_backward_warp(
            mips, *args, jnp.asarray(origins), ph, pw, wy, wx,
            img_shape=hw, interpret=True)

        ixn, ipn = np.asarray(ix), np.asarray(ip)
        np.testing.assert_array_equal(ixn, ipn)
        val = ~ixn
        diff = np.abs(np.asarray(px)[val] - np.asarray(pp)[val])
        assert diff.max() < 1e-4, diff.max()

    def test_matches_xla_path_cylindrical(self):
        """CylProj eligibility: the kernel's middle ray coordinate flips
        from tan(y) to y (geometry.py CylProj); exactness vs the XLA
        gather on the same grid."""
        from pano360_tpu import geometry as geo
        rgba, projs, bottoms, resolution, im_range, hw, ph, pw = _setup(
            seed=7)
        args = (jnp.asarray(projs, jnp.float32),
                jnp.asarray(bottoms, jnp.int32),
                jnp.asarray(resolution, jnp.float32),
                jnp.asarray(im_range[0], jnp.float32))
        px, ix = render.backward_warp_all(rgba, *args, ph, pw,
                                          projection=geo.CylProj)

        origins, ok, wy, wx, nl = PW.plan_windows(
            projs, bottoms, resolution, im_range[0], hw, ph, pw,
            cylindrical=True)
        assert ok, "cylindrical test scene should be eligible"
        mips = PW.build_mips(jnp.moveaxis(rgba, -1, 1), nl, wy, wx)
        pp, ip = PW.pallas_backward_warp(
            mips, *args, jnp.asarray(origins), ph, pw, wy, wx,
            img_shape=hw, interpret=True, cylindrical=True)

        ixn, ipn = np.asarray(ix), np.asarray(ip)
        np.testing.assert_array_equal(ixn, ipn)
        val = ~ixn
        diff = np.abs(np.asarray(px)[val] - np.asarray(pp)[val])
        assert diff.max() < 1e-4, diff.max()

    def test_star_import_all_consistent(self):
        """Every name in __all__ must exist (regression: WIN_Y/WIN_X)."""
        for name in PW.__all__:
            assert hasattr(PW, name), name

    def test_minification_whole_image_window(self):
        """Capped mosaic of a small source: the window covers the whole
        image, so the kernel stays eligible and must match XLA."""
        rgba, projs, bottoms, resolution, im_range, hw, ph, pw = _setup(
            max_resolution=120)
        args = (jnp.asarray(projs, jnp.float32),
                jnp.asarray(bottoms, jnp.int32),
                jnp.asarray(resolution, jnp.float32),
                jnp.asarray(im_range[0], jnp.float32))
        origins, ok, wy, wx, nl = PW.plan_windows(
            projs, bottoms, resolution, im_range[0], hw, ph, pw)
        assert ok, "small source should stay eligible under minification"
        px, ix = render.backward_warp_all(rgba, *args, ph, pw)
        mips = PW.build_mips(jnp.moveaxis(rgba, -1, 1), nl, wy, wx)
        pp, ip = PW.pallas_backward_warp(
            mips, *args, jnp.asarray(origins),
            ph, pw, wy, wx, img_shape=hw, interpret=True)
        np.testing.assert_array_equal(np.asarray(ix), np.asarray(ip))
        val = ~np.asarray(ix)
        diff = np.abs(np.asarray(px)[val] - np.asarray(pp)[val])
        if nl == 1:
            assert diff.max() < 1e-4, diff.max()
        else:   # mip-sampled tiles are a (better-filtered) approximation
            mse = float(np.mean(diff ** 2))
            psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
            assert psnr > 25, psnr

    def test_minification_mip_eligible(self):
        """A capped mosaic of a source too large for a level-0 window must
        stay eligible through coarser mip levels (previously an XLA
        fallback; VERDICT round-1 weak #4), with masks identical to the
        gather path and pixels close to it."""
        rgba, projs, bottoms, resolution, im_range, hw, ph, pw = _setup(
            shape=(300, 700), max_resolution=120)
        args = (jnp.asarray(projs, jnp.float32),
                jnp.asarray(bottoms, jnp.int32),
                jnp.asarray(resolution, jnp.float32),
                jnp.asarray(im_range[0], jnp.float32))
        origins, ok, wy, wx, nl = PW.plan_windows(
            projs, bottoms, resolution, im_range[0], hw, ph, pw)
        assert ok, "mip levels must keep heavy minification eligible"
        assert nl > 1
        px, ix = render.backward_warp_all(rgba, *args, ph, pw)
        mips = PW.build_mips(jnp.moveaxis(rgba, -1, 1), nl, wy, wx)
        pp, ip = PW.pallas_backward_warp(
            mips, *args, jnp.asarray(origins), ph, pw, wy, wx,
            img_shape=hw, interpret=True)
        np.testing.assert_array_equal(np.asarray(ix), np.asarray(ip))
        val = ~np.asarray(ix)
        diff = np.abs(np.asarray(px)[val] - np.asarray(pp)[val])
        mse = float(np.mean(diff ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr > 25, psnr

    def test_minification_forced_exact_level0(self):
        """The measurement knob plan_windows(force_level0=True, max_win)
        must produce an all-level-0 plan whose kernel output matches the
        XLA gather EXACTLY (to f32 interpret-mode rounding) even where
        the default plan would have gone to mip levels — the basis of
        WARP.json's capped_1400.exact_forced cell."""
        rgba, projs, bottoms, resolution, im_range, hw, ph, pw = _setup(
            shape=(300, 700), max_resolution=120)
        args = (jnp.asarray(projs, jnp.float32),
                jnp.asarray(bottoms, jnp.int32),
                jnp.asarray(resolution, jnp.float32),
                jnp.asarray(im_range[0], jnp.float32))
        _, _, _, _, nl_def = PW.plan_windows(
            projs, bottoms, resolution, im_range[0], hw, ph, pw)
        assert nl_def > 1, "scene must default to mip levels"
        origins, ok, wy, wx, nl = PW.plan_windows(
            projs, bottoms, resolution, im_range[0], hw, ph, pw,
            force_level0=True, max_win=(512, 1024))
        assert ok and nl == 1
        assert (np.asarray(origins)[..., 2] == 0).all()
        px, ix = render.backward_warp_all(rgba, *args, ph, pw)
        mips = PW.build_mips(jnp.moveaxis(rgba, -1, 1), 1, wy, wx)
        pp, ip = PW.pallas_backward_warp(
            mips, *args, jnp.asarray(origins), ph, pw, wy, wx,
            img_shape=hw, interpret=True)
        np.testing.assert_array_equal(np.asarray(ix), np.asarray(ip))
        val = ~np.asarray(ix)
        diff = np.abs(np.asarray(px)[val] - np.asarray(pp)[val])
        assert diff.max() < 1e-4, diff.max()

    def test_matches_xla_path_periodic(self):
        """Periodic (wrap-around) canvas: a window crossing the seam must
        sample fold columns at their final column's azimuth, matching the
        XLA path's period logic exactly.

        period MUST be the true full-turn width (2*pi / res_x): the ray
        is then continuous across the seam (sin/cos periodicity), which
        the kernel's corner-based window planning relies on. The
        crossing view is yawed to look at the seam so its window holds
        real content."""
        rgba, projs, bottoms, resolution, im_range, hw, ph, pw = _setup()
        bottoms = bottoms.copy()
        period = int(round(2 * np.pi / float(resolution[0])))
        # move view 0's window one full turn up so it crosses the seam:
        # columns past `period` sample at az - 2*pi, i.e. exactly the
        # view's original content (the fold's final columns)
        bottoms[0, 0] += period - pw // 2 - int(bottoms[0, 0])
        args = (jnp.asarray(projs, jnp.float32),
                jnp.asarray(bottoms, jnp.int32),
                jnp.asarray(resolution, jnp.float32),
                jnp.asarray(im_range[0], jnp.float32))
        px, ix = render.backward_warp_all(rgba, *args, ph, pw,
                                          period=period)

        origins, ok, wy, wx, nl = PW.plan_windows(
            projs, bottoms, resolution, im_range[0], hw, ph, pw,
            period=period)
        assert ok, "periodic test scene should be eligible"
        mips = PW.build_mips(jnp.moveaxis(rgba, -1, 1), nl, wy, wx)
        pp, ip = PW.pallas_backward_warp(
            mips, *args, jnp.asarray(origins), ph, pw, wy, wx,
            img_shape=hw, interpret=True, period=period)

        ixn, ipn = np.asarray(ix), np.asarray(ip)
        np.testing.assert_array_equal(ixn, ipn)
        # the crossing window must actually produce valid content on
        # both sides of the seam
        assert (~ixn[0]).any()
        val = ~ixn
        diff = np.abs(np.asarray(px)[val] - np.asarray(pp)[val])
        assert diff.max() < 1e-4, diff.max()

    def test_stitch_pallas_flag_cpu_fallback(self):
        """use_pallas=None on CPU silently uses the XLA path."""
        imgs, rots, focal = synth.make_views(n_views=2, shape=(120, 160),
                                             overlap=0.5, seed=7)
        intr = np.diag([focal, focal, 1.0])
        regions = [PanoImage((im * 255).astype(np.uint8), r, intr.copy())
                   for im, r in zip(imgs, rots)]
        mosaic = render.stitch(regions, blender="linear")
        assert mosaic.ndim == 3 and mosaic.dtype == np.uint8
