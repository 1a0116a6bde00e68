"""MSOP detector tests (the reference's alternative feature path)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; fast subset: -m 'not slow'

from pano360_tpu import synth
from pano360_tpu.features.msop import (msop_extract_batch,
                                       msop_extract_host, ssc)
from pano360_tpu.cli import build_parser, run


class TestMsop:
    def test_extract(self):
        imgs, _, _ = synth.make_views(n_views=1, shape=(160, 200), seed=31)
        kpts, desc = msop_extract_host((imgs[0] * 255).astype(np.uint8))
        assert len(kpts) > 200
        assert desc.shape == (len(kpts), 64)
        # normalized descriptors: zero mean, unit-ish std
        assert abs(float(desc.mean())) < 0.05
        h, w = 160, 200
        assert (kpts[:, 0] < w).all() and (kpts[:, 1] < h).all()

    def test_batch_matches_single(self):
        """The batched path (one vmapped dispatch per level for all
        images) must reproduce the per-image results."""
        imgs, _, _ = synth.make_views(n_views=3, shape=(160, 200), seed=7)
        imgs = [(im * 255).astype(np.uint8) for im in imgs]
        batch = msop_extract_batch(imgs)
        for im, (kb, db) in zip(imgs, batch):
            ks, ds = msop_extract_host(im)
            np.testing.assert_allclose(kb, ks, atol=1e-4)
            np.testing.assert_allclose(db, ds, atol=1e-4)

    def test_ssc_homogeneous(self):
        rng = np.random.default_rng(3)
        pts = rng.uniform(0, 200, (2000, 2)).astype(np.float32)
        sel = ssc(pts, (200, 200), 100)
        assert 80 <= len(sel) <= 120
        # coverage: selected points spread over all quadrants
        s = pts[sel]
        for qx in (0, 1):
            for qy in (0, 1):
                q = ((s[:, 0] >= qx * 100) & (s[:, 0] < (qx + 1) * 100)
                     & (s[:, 1] >= qy * 100) & (s[:, 1] < (qy + 1) * 100))
                assert q.sum() >= 10

    def test_cli_end_to_end(self, tmp_path):
        """BASELINE config #4: the MSOP extractor through the full CLI."""
        imgs, _, _ = synth.make_views(n_views=3, shape=(150, 200),
                                      overlap=0.5, seed=31)
        ds = tmp_path / "views"
        synth.write_dataset(str(ds), imgs)
        args = build_parser().parse_args(
            [str(ds), "-s", "1", "--detector", "msop", "--ba", "incr",
             "-b", "linear", "--cache-dir", str(tmp_path)])
        mosaic = run(args)
        assert mosaic.shape[1] > 1.5 * 200
        inner = mosaic[mosaic.shape[0] // 3: -mosaic.shape[0] // 3,
                       mosaic.shape[1] // 4: -mosaic.shape[1] // 4]
        assert (inner.sum(-1) > 0).mean() > 0.9
