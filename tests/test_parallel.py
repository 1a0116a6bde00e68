"""Mesh-parallel paths vs their single-device equivalents (8 virtual CPUs)."""
import numpy as np
import numpy.testing as npt
import jax
import jax.numpy as jnp
import pytest

from pano360_tpu import synth
from pano360_tpu import register as R
from pano360_tpu.features import sift as S
from pano360_tpu.parallel import (make_mesh, sharded_extract,
                                  distributed_lm_stats)

pytestmark = [
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs 8 virtual devices"),
    pytest.mark.slow,   # compile-heavy; fast subset: -m 'not slow'
]

CFG = S.SiftConfig(max_kpts=128, upscale=False)


@pytest.fixture(scope="module")
def gray8():
    imgs, _, _ = synth.make_views(n_views=8, shape=(64, 96), overlap=0.5,
                                  seed=0)
    return jnp.asarray(np.stack([im.mean(-1) for im in imgs]), jnp.float32)


class TestParallel:
    def test_sharded_extract_matches_local(self, gray8):
        mesh = make_mesh(8)
        sharded = sharded_extract(mesh, gray8, CFG)
        local = S.sift_extract(gray8, CFG)
        vs = np.asarray(sharded.valid)
        vl = np.asarray(local.valid)
        npt.assert_array_equal(vs, vl)
        both = vs & vl   # padded slots hold garbage; compare valid only
        npt.assert_allclose(np.asarray(sharded.xy)[both],
                            np.asarray(local.xy)[both], atol=1e-3)
        npt.assert_allclose(np.asarray(sharded.desc)[both],
                            np.asarray(local.desc)[both], atol=1e-3)

    def test_distributed_lm_matches_local(self):
        rng = np.random.default_rng(4)
        c, e, m = 4, 8, 64
        params = jnp.asarray(rng.standard_normal((c, 6)) * 0.1
                             + np.array([500, 0, 0, 0, 0, 0]), jnp.float32)
        cam1 = jnp.asarray(rng.integers(0, c, e), jnp.int32)
        cam2 = jnp.asarray((rng.integers(1, c, e) + np.asarray(cam1)) % c,
                           jnp.int32)
        pts = np.ones((e, m, 6), np.float32)
        pts[..., :2] = rng.uniform(-100, 100, (e, m, 2))
        pts[..., 3:5] = rng.uniform(-100, 100, (e, m, 2))
        pts = jnp.asarray(pts)
        mask = jnp.asarray(rng.random((e, m)) > 0.3, jnp.float32)

        mesh = make_mesh(8)
        d = distributed_lm_stats(mesh, params, cam1, cam2, pts, mask)
        l = R._lm_stats(params, cam1, cam2, pts, mask)
        npt.assert_allclose(float(d[0]), float(l[0]), rtol=1e-5)
        npt.assert_allclose(float(d[1]), float(l[1]), rtol=1e-6)
        npt.assert_allclose(np.asarray(d[2]), np.asarray(l[2]),
                            rtol=1e-4, atol=1e-2)
        npt.assert_allclose(np.asarray(d[3]), np.asarray(l[3]),
                            rtol=1e-4, atol=1e-2)

    # NOTE: the full distributed_step (extract -> ring match -> psum'd
    # Gauss-Newton) is exercised by __graft_entry__.dryrun_multichip, which
    # the driver runs on every round; duplicating it here would add ~7 min
    # of mesh compiles to the suite.
