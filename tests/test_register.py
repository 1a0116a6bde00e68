"""Bundle adjustment and traverse tests, including parity with the
reference's hand-derived Jacobian and full traverse."""
import numpy as np
import numpy.testing as npt
import jax.numpy as jnp
import pytest

import refcompat  # noqa: F401
import bundle_adj as ref_ba

from pano360_tpu import register as R
from pano360_tpu import geometry as geo

RNG = np.random.default_rng(21)


def synthetic_problem(n_cams=4, n_pts=60, focal=900.0, noise=0.3, seed=3):
    """Cameras on a yaw arc + matches generated from true geometry."""
    rng = np.random.default_rng(seed)
    rots = [np.asarray(geo.exp_so3(jnp.asarray([0.02 * rng.standard_normal(),
                                                0.35 * i, 0.0])))
            for i in range(n_cams)]
    intr = np.diag([focal, focal, 1.0])
    cams = [R.PanoImage(None, r, intr.copy()) for r in rots]

    matches = {i: {} for i in range(n_cams)}
    for i in range(n_cams - 1):
        j = i + 1
        # sample points visible in camera i
        p1 = rng.uniform(-300, 300, (n_pts, 2))
        hom = cams[j].intr @ cams[j].rot @ cams[i].rot.T @ \
            np.linalg.inv(cams[i].intr)
        ph = np.concatenate([p1, np.ones((n_pts, 1))], 1) @ hom.T
        p2 = ph[:, :2] / ph[:, 2:] + rng.normal(0, noise, (n_pts, 2))
        m_ij = np.concatenate([p1, np.ones((n_pts, 1)),
                               p2, np.ones((n_pts, 1))], axis=1)
        m_ji = np.concatenate([m_ij[:, 3:], m_ij[:, :3]], axis=1)
        matches[i][j] = (m_ij, hom, n_pts)
        matches[j][i] = (m_ji, np.linalg.inv(hom), n_pts)
    return cams, matches, focal


class TestJacobianParity:
    def test_jtj_matches_reference(self):
        """Our AD-based normal equations == reference symbolic Jacobian."""
        cams, matches, _ = synthetic_problem(n_cams=3, n_pts=20)
        ref_cams = [ref_ba.Image(None, c.rot, c.intr) for c in cams]
        edges = [(1, 0, matches[0][1][0]), (2, 1, matches[1][2][0])]

        jac, jtj_ref = ref_ba._jacobian_symbolic(ref_cams, edges)
        errs = ref_ba.residuals(ref_cams, edges)
        jtr_ref = jac.T @ errs

        iba = R.BundleAdjuster(3, mode="none", dtype=np.float64)
        iba.cameras = list(cams)
        iba.matches = edges
        idx, params, cam1, cam2, pts, mask = iba._assemble()
        sq, n, jtj, jtr = R._lm_stats(jnp.asarray(params), jnp.asarray(cam1),
                                      jnp.asarray(cam2), jnp.asarray(pts),
                                      jnp.asarray(mask))
        nc = len(idx) * 6
        npt.assert_allclose(np.asarray(jtj)[:nc, :nc], jtj_ref, rtol=1e-5,
                            atol=1e-4)
        npt.assert_allclose(np.asarray(jtr)[:nc], jtr_ref, rtol=1e-5,
                            atol=1e-5)
        # loss too
        npt.assert_allclose(np.sqrt(float(sq) / float(n)),
                            ref_ba.loss(errs), rtol=1e-6)


class TestOptimize:
    def test_reduces_error(self):
        cams, matches, focal = synthetic_problem(noise=0.5)
        iba = R.BundleAdjuster(4, mode="none")
        # perturb rotations
        for i, c in enumerate(cams):
            pert = np.asarray(geo.exp_so3(
                jnp.asarray(0.01 * RNG.standard_normal(3))))
            iba.cameras[i] = R.PanoImage(None, pert @ c.rot, c.intr.copy())
        for i in range(3):
            iba.matches.append((i + 1, i, matches[i][i + 1][0]))

        idx, params, cam1, cam2, pts, mask = iba._assemble()
        sq, n = R._loss_stats(jnp.asarray(params), jnp.asarray(cam1),
                              jnp.asarray(cam2), jnp.asarray(pts),
                              jnp.asarray(mask))
        before = np.sqrt(float(sq) / float(n))

        iba.optimize()

        idx, params, cam1, cam2, pts, mask = iba._assemble()
        sq, n = R._loss_stats(jnp.asarray(params), jnp.asarray(cam1),
                              jnp.asarray(cam2), jnp.asarray(pts),
                              jnp.asarray(mask))
        after = np.sqrt(float(sq) / float(n))
        assert after < before * 0.2, (before, after)
        assert after < 1.5  # close to the noise floor


class TestTraverse:
    def test_places_all_cameras(self):
        cams, matches, focal = synthetic_problem(noise=0.3)
        regions = R.traverse([np.zeros((10, 10, 3))] * 4, matches,
                             badjust="incr")
        assert len(regions) == 4
        est_f = regions[0].intr[0, 0]
        assert abs(est_f - focal) / focal < 0.05

        # relative rotations must match ground truth
        for i in range(3):
            true_rel = cams[i + 1].rot @ cams[i].rot.T
            est_rel = regions[i + 1].rot @ regions[i].rot.T
            dr = est_rel @ true_rel.T
            ang = np.degrees(np.arccos(np.clip((np.trace(dr) - 1) / 2,
                                               -1, 1)))
            assert ang < 0.5, f"edge {i}: {ang} deg"

    def test_modes_agree(self):
        _, matches, _ = synthetic_problem(noise=0.2, seed=9)
        imgs = [np.zeros((10, 10, 3))] * 4
        r_incr = R.traverse(imgs, matches, badjust="incr")
        r_last = R.traverse(imgs, matches, badjust="last")
        r_none = R.traverse(imgs, matches, badjust="none")
        assert len(r_incr) == len(r_last) == len(r_none) == 4
        for a, b in zip(r_incr, r_last):
            dr = a.rot @ b.rot.T
            ang = np.degrees(np.arccos(np.clip((np.trace(dr) - 1) / 2,
                                               -1, 1)))
            assert ang < 1.0

    def test_parity_with_reference_traverse(self):
        """Same matches dict through ours and the reference's traverse."""
        _, matches, focal = synthetic_problem(noise=0.3, seed=5)
        imgs = [np.zeros((8, 8, 3))] * 4
        ours = R.traverse(imgs, matches, badjust="incr")
        theirs = ref_ba.traverse(list(imgs), {
            i: dict(col) for i, col in matches.items()}, badjust="incr")
        assert len(ours) == len(theirs)
        # LM trajectories differ slightly (the reference linearizes at the
        # best-so-far with stale residuals; we linearize consistently), so
        # compare at physical precision: focal to 1%, rotations to 0.5 deg.
        npt.assert_allclose(ours[0].intr[0, 0], theirs[0].intr[0, 0],
                            rtol=1e-2)
        for a, b in zip(ours, theirs):
            dr = a.rot @ b.rot.T
            ang = np.degrees(np.arccos(np.clip((np.trace(dr) - 1) / 2,
                                               -1, 1)))
            assert ang < 0.5, f"{ang} deg"

    def test_lm_core_first_reject_exit_equals_5_stall_schedule(self):
        """Pin _lm_core's early exit against the literal stall budget.

        _lm_core exits at the FIRST rejected step (register.py cond:
        ``stalls < 1``), asserting equivalence to the reference's
        5-further-stall budget (bundle_adj.py:341-343) by a frozen-state
        argument: with fixed lambda and rollback-on-reject, the rolled-back
        state reproduces the same linearization, the same step, and the
        same rejection, so the extra stall iterations are no-ops. This
        test runs the literal schedule — a host loop over the SAME
        jitted linearization (R._lm_stats) and the same preconditioned
        solve — under BOTH stall budgets and asserts bit-identical
        (best, best_err) between them (same code path, so any difference
        would be a real schedule divergence, not compiler roundoff); it
        then ties _lm_core itself to the literal loop at f32-roundoff
        tolerance (a fused while_loop body and an eager op-by-op loop
        compile to different programs, so exact bitwise equality across
        them is not defined).

        (The reference's OTHER post-reject quirk — it carries the
        rejected trial's residuals into the next RHS, bundle_adj.py:
        320-335 — is a stale-linearization divergence from BOTH schedules
        here; its effect is bounded by test_parity_with_reference_traverse
        above.)
        """
        import jax

        def literal_lm(params0, cam1, cam2, pts, mask, stall_budget,
                       max_iter=100):
            nc6 = params0.shape[0] * 6

            def loss_of(p):
                sq, n = R._loss_stats(p, cam1, cam2, pts, mask)
                return jnp.sqrt(sq / jnp.maximum(n, 1.0))

            cur = best = params0
            best_err = loss_of(params0)
            n_not_improved = 0
            n_rejects_replayed = 0
            for _ in range(max_iter):
                _, _, jtj, jtr = R._lm_stats(cur, cam1, cam2, pts, mask)
                # identical solve expression to _lm_core's body
                jtj = jtj + R.LM_LAMBDA * jnp.eye(nc6, dtype=jtj.dtype)
                d = jax.lax.rsqrt(jnp.diagonal(jtj) + 1e-12)
                a = jtj * d[:, None] * d[None, :]
                b = jtr * d
                delta = (jnp.linalg.solve(a, b) * d).reshape(cur.shape)
                trial = cur - delta
                err = loss_of(trial)
                if float(err) < float(best_err) - R.LM_MIN_IMPROVE:
                    best_err = err
                    best = cur = trial
                else:
                    n_not_improved += 1
                    n_rejects_replayed += 1
                    cur = best  # rollback, as self.cameras stays at best
                    if n_not_improved > stall_budget:
                        break
            return np.asarray(best), float(best_err), n_rejects_replayed

        for seed, noise, n_cams in ((3, 0.3, 4), (11, 1.5, 4), (5, 0.6, 3)):
            cams, matches, _ = synthetic_problem(
                n_cams=n_cams, n_pts=40, noise=noise, seed=seed)
            iba = R.BundleAdjuster(n_cams, mode="none")
            rng = np.random.default_rng(seed)
            for i, c in enumerate(cams):
                pert = np.asarray(geo.exp_so3(
                    jnp.asarray(0.02 * rng.standard_normal(3))))
                iba.cameras[i] = R.PanoImage(None, pert @ c.rot,
                                             c.intr.copy())
            for i in range(n_cams - 1):
                iba.matches.append((i + 1, i, matches[i][i + 1][0]))
            _, params, cam1, cam2, pts, mask = iba._assemble()
            args = (jnp.asarray(params, jnp.float32), jnp.asarray(cam1),
                    jnp.asarray(cam2), jnp.asarray(pts, jnp.float32),
                    jnp.asarray(mask, jnp.float32))

            best_core, err_core, _ = R._lm_optimize(*args)
            best_5, err_5, n_rej = literal_lm(*args, stall_budget=5)
            best_0, err_0, _ = literal_lm(*args, stall_budget=0)

            # the stall budget must actually be exercised (otherwise the
            # equivalence is vacuously true on this problem)
            assert n_rej >= 6, "stall budget never exhausted"
            # schedule equivalence, bitwise (same code path)
            assert np.array_equal(best_5, best_0), (
                np.abs(best_5 - best_0).max())
            assert err_5 == err_0
            # the fused device kernel lands at the same optimum up to
            # cross-program f32 roundoff; compare by loss (the parameter
            # vector has an unobservable global-rotation gauge direction
            # along which roundoff-separated runs drift freely)
            npt.assert_allclose(float(err_core), err_5, rtol=1e-4)

    def test_unconnected_camera_dropped(self):
        _, matches, _ = synthetic_problem(noise=0.2, seed=7)
        # 5th image with no matches
        matches[4] = {}
        regions = R.traverse([np.zeros((8, 8, 3))] * 5, matches,
                             badjust="none")
        assert len(regions) == 4

    def test_disconnected_cluster_dropped(self):
        """Two-component match graph: the walk places only the seed's
        component (reference semantics: traverse starts from the best
        pair and unreached cameras drop, bundle_adj.py:348-395)."""
        _, matches, _ = synthetic_problem(n_cams=6, noise=0.2, seed=9)
        # cut the chain between 2 and 3 -> components {0,1,2} / {3,4,5}
        del matches[2][3], matches[3][2]
        # make the seed pair land in the first component
        m01, h01, _ = matches[0][1]
        matches[0][1] = (m01, h01, 999)
        imgs = [np.full((8, 8, 3), i, np.uint8) for i in range(6)]
        regions = R.traverse(imgs, matches, badjust="none")
        assert len(regions) == 3
        assert sorted(int(r.img[0, 0, 0]) for r in regions) == [0, 1, 2]
