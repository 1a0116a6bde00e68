"""Tests for the experimental blenders (blend.py equivalents)."""
import numpy as np
import numpy.testing as npt
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; fast subset: -m 'not slow'

import refcompat  # noqa: F401
import blend as ref_blend
import bundle_adj as ref_ba

from pano360_tpu import blend_extra, synth, viz
from pano360_tpu.native import seam_flood, _seam_flood_py

RNG = np.random.default_rng(41)


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / mse) if mse > 0 else np.inf


@pytest.fixture(scope="module")
def two_views():
    imgs, rots, focal = synth.make_views(n_views=2, shape=(120, 160),
                                         overlap=0.5, seed=23)
    return [(im * 255).astype(np.uint8) for im in imgs], focal


class TestWarp:
    def test_matches_reference_warp(self, two_views):
        imgs, focal = two_views
        kint = ref_ba.intrinsics(focal, (80, 60))
        ours = blend_extra.warp(imgs[0], kint)
        theirs = ref_blend.warp(imgs[0], kint)
        # NOTE: the reference remaps into an *uninitialized* buffer with
        # BORDER_TRANSPARENT (blend.py:43-45), so its out-of-range alpha
        # is heap garbage; compare only where both agree on validity,
        # ERODED by one pixel — the reference's bilinear taps at the
        # validity boundary blend that garbage into otherwise-valid
        # pixels, which makes an un-eroded PSNR jitter run to run with
        # whatever the heap held.
        import cv2
        m_ours = ours[..., 3] > 0
        m_ref = theirs[..., 3] > 0
        both = m_ours & m_ref
        assert both.mean() > 0.5        # warped region is substantial
        assert (m_ours | m_ref).sum() < 1.3 * both.sum()
        interior = cv2.erode(both.astype(np.uint8),
                             np.ones((3, 3), np.uint8)).astype(bool)
        p = psnr(ours[interior][:, :3], theirs[interior][:, :3])
        assert p > 30, f"PSNR {p:.1f}"


class TestGraphCut:
    def test_partitions_overlap(self, two_views):
        imgs, _ = two_views
        a = imgs[0][:, -80:].astype(np.float32)
        b = imgs[1][:, :80].astype(np.float32)
        mask = blend_extra.graph_cut(a.astype(np.uint8), b.astype(np.uint8),
                                     shrink=2)
        assert mask.shape[:2] == a.shape[:2]
        frac = (mask > 127).mean()
        assert 0.05 < frac < 0.95   # both sides present
        # left edge belongs to img1, right edge to img2
        assert (mask[:, 0] > 127).mean() > 0.9
        assert (mask[:, -1] > 127).mean() < 0.1

    def test_native_flood_structure(self):
        """A low-difference corridor must attract the seam: the flood pops
        the LARGEST difference first (blend.py:86-97 semantics), so high-
        difference cells are claimed early by the nearest source and the
        two fronts meet on the corridor (regression for the inverted-heap
        C++ flood that ignored costs and met mid-overlap)."""
        rows, cols, corridor = 30, 40, 10
        diff = 1.0 + np.arange(rows * cols, dtype=np.float32
                               ).reshape(rows, cols) * 1e-5  # unique costs
        diff[:, corridor] = 0.01 + np.arange(rows) * 1e-5
        for mask in (seam_flood(diff, border=3),
                     _seam_flood_py(diff, border=3)):
            assert set(np.unique(mask)) <= {-1, 1}
            npt.assert_array_equal(mask[:, :corridor], -1)
            npt.assert_array_equal(mask[:, corridor + 1:], 1)


class TestLaplacian:
    def test_matches_reference(self):
        a = RNG.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        b = RNG.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        ours = blend_extra.laplacian_blending(a, b, n_levels=4)
        theirs = ref_blend.laplacian_blending(a, b, n_levels=4)
        p = psnr(ours, theirs)
        assert p > 30, f"PSNR {p:.1f}"


class TestPoisson:
    def test_matches_reference_solver(self):
        src = RNG.integers(0, 255, (40, 48, 3)).astype(np.uint8)
        tgt = RNG.integers(0, 255, (40, 48, 3)).astype(np.uint8)
        mask = np.zeros((40, 48), np.uint8)
        mask[8:32, 10:38] = 255
        ours = blend_extra.poisson_blend(src, tgt.copy(), mask, iters=600)
        theirs = ref_blend.poisson_blend(src, tgt.copy(), mask > 127)
        p = psnr(ours, theirs)
        assert p > 35, f"PSNR {p:.1f}"
        # boundary (outside mask) equals the target
        outside = mask == 0
        npt.assert_array_equal(ours[outside], tgt[outside])

    def test_curved_source_matches_reference(self):
        """Non-zero-Laplacian source: CG equals the sparse direct solve."""
        yy = np.linspace(-1, 1, 30)
        quad = (100 + 100 * np.outer(yy ** 2, np.ones(30)))
        src = np.repeat(quad.astype(np.uint8)[..., None], 3, axis=2)
        tgt = np.full((30, 30, 3), 128, np.uint8)
        mask = np.zeros((30, 30), np.uint8)
        mask[5:25, 5:25] = 255
        ours = blend_extra.poisson_blend(src, tgt.copy(), mask, iters=800)
        theirs = ref_blend.poisson_blend(src, tgt.copy(), mask > 127)
        p = psnr(ours, theirs)
        assert p > 40, f"PSNR {p:.1f}"


class TestViz:
    def test_plot_points_and_descs(self, two_views):
        imgs, _ = two_views
        pts = [(20, 30, 0.5, 2.0), (50, 60, -1.0, 1.0)]
        out = viz.plot_points(imgs[0], pts)
        assert out.shape == imgs[0].shape
        assert (out != imgs[0]).any()
        descs = RNG.random((10, 64)).astype(np.float32)
        tiles = viz.plot_descs(descs)
        assert tiles.shape == (25 * 8 * 4, 25 * 8 * 4)

    def test_match_images(self, two_views):
        imgs, _ = two_views
        p1 = RNG.uniform(0, 100, (5, 2))
        p2 = RNG.uniform(0, 100, (5, 2))
        canvas = viz.match_images(imgs[0], imgs[1], p1, p2)
        assert canvas.shape[1] == imgs[0].shape[1] + imgs[1].shape[1]
