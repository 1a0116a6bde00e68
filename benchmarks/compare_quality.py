"""Mosaic quality comparison against the CPU reference at benchmark scale.

Two PSNR numbers, because registration differences dominate naive pixel
comparison:

1. **render parity**: both renderers consume the *reference's* registration
   (same cameras), so PSNR isolates the warp/blend implementation. This is
   the number the >=40 dB target meaningfully applies to.
2. **end-to-end**: each pipeline registers independently; sub-pixel global
   alignment differences (focal within ~0.2%) shift textured content and
   bound the attainable PSNR regardless of render quality.

Writes QUALITY.json and the mosaics under benchmarks/.
"""
import json
import os
import sys
import types

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import cv2
if not hasattr(cv2, "xfeatures2d"):
    cv2.xfeatures2d = types.SimpleNamespace(SIFT_create=cv2.SIFT_create)
if not hasattr(np, "object"):
    np.object = object
sys.path.insert(0, "/root/reference")

from benchmarks.measure_baseline import bench_dataset  # noqa: E402


def psnr(a, b):
    if a.shape != b.shape:
        # tolerate 1-2 px mosaic-extent rounding differences: compare the
        # common top-left region (mosaics share the same range anchor)
        if (abs(a.shape[0] - b.shape[0]) > 2
                or abs(a.shape[1] - b.shape[1]) > 2):
            return 0.0
        h = min(a.shape[0], b.shape[0])
        w = min(a.shape[1], b.shape[1])
        a, b = a[:h, :w], b[:h, :w]
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float(10 * np.log10(255.0 ** 2 / mse)) if mse > 0 else np.inf


def psnr_aligned(a, b, max_shift: int = 12):
    """PSNR after searching an integer translation (mosaic grids anchor
    at each camera set's own projected range, so even sub-degree camera
    differences shift the whole canvas by a few pixels)."""
    h = min(a.shape[0], b.shape[0])
    w = min(a.shape[1], b.shape[1])
    a = a[:h, :w].astype(np.float64)
    b = b[:h, :w].astype(np.float64)
    best = (0.0, 0, 0)
    for dy in range(-max_shift, max_shift + 1):
        for dx in range(-max_shift, max_shift + 1):
            ya0, yb0 = max(dy, 0), max(-dy, 0)
            xa0, xb0 = max(dx, 0), max(-dx, 0)
            hh, ww = h - abs(dy), w - abs(dx)
            if hh < 32 or ww < 32:
                continue
            diff = (a[ya0:ya0 + hh, xa0:xa0 + ww]
                    - b[yb0:yb0 + hh, xb0:xb0 + ww])
            mse = np.mean(diff * diff)
            p = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
            if p > best[0]:
                best = (p, dy, dx)
    return best


def psnr_at(a, b, sy, sx):
    """PSNR of ``a`` against ``b`` bilinearly resampled at a fractional
    translation (sy, sx), over the valid overlap."""
    h = min(a.shape[0], b.shape[0])
    w = min(a.shape[1], b.shape[1])
    a = a[:h, :w].astype(np.float64)
    b = b[:h, :w].astype(np.float64)
    yy = np.arange(h, dtype=np.float64)[:, None] - sy
    xx = np.arange(w, dtype=np.float64)[None, :] - sx
    yi = np.floor(yy).astype(int)
    xi = np.floor(xx).astype(int)
    fy = (yy - yi)[..., None]
    fx = (xx - xi)[..., None]
    valid = (yi >= 0) & (yi < h - 1) & (xi >= 0) & (xi < w - 1)
    yi = np.clip(yi, 0, h - 2)
    xi = np.clip(xi, 0, w - 2)
    bs = (b[yi, xi] * (1 - fy) * (1 - fx) + b[yi, xi + 1] * (1 - fy) * fx
          + b[yi + 1, xi] * fy * (1 - fx) + b[yi + 1, xi + 1] * fy * fx)
    diff = np.where(valid[..., None], a - bs, 0.0)
    n = max(int(valid.sum()) * a.shape[-1], 1)
    mse = float(np.sum(diff * diff)) / n
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def psnr_subpixel(a, b, max_shift: int = 12):
    """Gauge-aligned PSNR: integer search, then sub-pixel coordinate
    descent on a bilinear translation of ``b``. A sub-pixel GLOBAL drift
    between two registrations shifts the whole canvas; without removing
    it, e2e PSNR measures the drift, not mosaic fidelity. Returns
    ``(psnr_db, sy, sx)``."""
    p0, dy, dx = psnr_aligned(a, b, max_shift)
    sy, sx = float(dy), float(dx)
    best = psnr_at(a, b, sy, sx)
    for step in (0.5, 0.25, 0.125, 0.0625, 0.03125):
        improved = True
        while improved:
            improved = False
            for cy, cx in ((sy + step, sx), (sy - step, sx),
                           (sy, sx + step), (sy, sx - step)):
                p = psnr_at(a, b, cy, cx)
                if p > best:
                    best, sy, sx, improved = p, cy, cx, True
    return best, round(sy, 4), round(sx, 4)


def reg_errors(regions, rots_gt, focal_gt):
    """Registration error vs synthetic ground truth: focal %, relative
    rotation degrees (consecutive pairs), and the implied mosaic-pixel
    displacement at the estimated focal."""
    f = float(regions[0].intr[0, 0])
    errs = []
    for i in range(len(regions) - 1):
        rel_est = regions[i + 1].rot @ regions[i].rot.T
        rel_gt = rots_gt[i + 1] @ rots_gt[i].T
        dr = rel_est @ rel_gt.T
        errs.append(np.degrees(np.arccos(np.clip((np.trace(dr) - 1) / 2,
                                                 -1, 1))))
    errs = np.array(errs)
    return {
        "focal_err_pct": round(100 * (f - focal_gt) / focal_gt, 4),
        "rel_rot_err_deg_mean": round(float(errs.mean()), 4),
        "rel_rot_err_deg_max": round(float(errs.max()), 4),
        "implied_px_shift_mean": round(float(
            np.radians(errs.mean()) * f), 3),
    }


def main():
    import features as ref_feat
    import stitcher as ref_st
    import bundle_adj as ref_ba

    from pano360_tpu.pipeline import matching, idx_to_keypoints, to_device
    from pano360_tpu.register import traverse, PanoImage
    from pano360_tpu import render

    imgs, rots_gt, focal_gt = bench_dataset()
    out = {}

    # --- reference end-to-end (registration reused for render parity)
    kpts_r, matches_r = ref_feat.matching(imgs)
    regions_ref = ref_ba.traverse(
        imgs, ref_st.idx_to_keypoints(matches_r, kpts_r), badjust="incr")
    m_ref = ref_st.stitch(
        [ref_ba.Image(r.img.copy(), r.rot.copy(), r.intr.copy())
         for r in regions_ref], blender=ref_st.multiband_blend)
    print(f"reference mosaic {m_ref.shape}", flush=True)

    # --- our render on the reference's registration (render parity)
    ours_shared = [PanoImage(r.img.copy(), r.rot.copy(), r.intr.copy())
                   for r in regions_ref]
    m_shared = render.stitch(ours_shared, blender="multiband")
    out["render_parity_psnr_db"] = round(psnr(m_shared, m_ref), 2)
    print(f"render parity (shared registration): "
          f"{out['render_parity_psnr_db']} dB", flush=True)

    # --- our full pipeline (independent registration)
    dev = to_device(imgs)
    kpts, matches = matching(imgs, seed=0, dev_images=dev)
    regions = traverse(imgs, idx_to_keypoints(matches, kpts),
                       badjust="incr")
    m_ours = render.stitch(regions, blender="multiband", dev_images=dev)
    out["e2e_psnr_db"] = round(psnr(m_ours, m_ref), 2)
    out["shapes"] = {"ref": list(m_ref.shape), "ours": list(m_ours.shape)}
    print(f"end-to-end (independent registration): "
          f"{out['e2e_psnr_db']} dB shapes={out['shapes']}", flush=True)

    # gauge-aligned e2e: remove the sub-pixel global drift between the
    # two independent registrations before comparing pixels
    p_al, sy, sx = psnr_subpixel(m_ours, m_ref)
    out["e2e_psnr_aligned_db"] = {"psnr": round(p_al, 2),
                                  "shift": [sy, sx]}
    print(f"end-to-end gauge-aligned: {p_al:.2f} dB "
          f"(shift {sy}, {sx})", flush=True)

    # parity mode: our traverse with the reference's exact fixed-lambda
    # LM stop (no adaptive polish) — isolates optimizer-schedule
    # divergence from feature/match divergence
    regions_par = traverse(imgs, idx_to_keypoints(matches, kpts),
                           badjust="incr", polish=False)
    m_par = render.stitch(regions_par, blender="multiband", dev_images=dev)
    p_par, sy_p, sx_p = psnr_subpixel(m_par, m_ref)
    out["e2e_parity_mode_aligned_db"] = {"psnr": round(p_par, 2),
                                         "shift": [sy_p, sx_p]}
    print(f"parity-mode (no polish) gauge-aligned: {p_par:.2f} dB",
          flush=True)

    # --- shared-match-graph decomposition: OUR traverse+render consumes
    # the REFERENCE's match graph (the structure its NPZ cache holds,
    # stitcher.py:423-428 / features.py:321), so the only remaining
    # divergence vs the reference mosaic is BA + render. With 73 dB
    # render parity, this isolates whether our registration itself (not
    # our SIFT front end) reproduces the reference's optimum.
    regions_smg = traverse(imgs, idx_to_keypoints(matches_r, kpts_r),
                           badjust="incr")
    m_smg = render.stitch(regions_smg, blender="multiband", dev_images=dev)
    p_smg, sy_s, sx_s = psnr_subpixel(m_smg, m_ref)
    out["shared_matchgraph_e2e_db"] = {"psnr": round(p_smg, 2),
                                       "shift": [sy_s, sx_s]}
    print(f"shared match graph (ref matches -> our BA+render): "
          f"{p_smg:.2f} dB (shift {sy_s}, {sx_s})", flush=True)

    # same cell with the reference's exact fixed-lambda LM stop
    # (polish=False): the remaining divergence is solver roundoff only,
    # so THIS is the apples-to-apples >=40 dB criterion cell. With the
    # default polish our cameras deliberately converge PAST the
    # reference's under-converged stop (and land closer to ground truth,
    # see vs_gt_mosaic_psnr_db), which costs vs-reference PSNR.
    regions_smp = traverse(imgs, idx_to_keypoints(matches_r, kpts_r),
                           badjust="incr", polish=False)
    m_smp = render.stitch(regions_smp, blender="multiband",
                          dev_images=dev)
    p_smp, sy_p2, sx_p2 = psnr_subpixel(m_smp, m_ref)
    out["shared_matchgraph_parity_db"] = {"psnr": round(p_smp, 2),
                                          "shift": [sy_p2, sx_p2]}
    print(f"shared match graph + reference LM stop (parity): "
          f"{p_smp:.2f} dB (shift {sy_p2}, {sx_p2})", flush=True)

    # the reverse cell: the reference's BA+render on OUR match graph
    # (our (kpts, matches) arrays are structure-compatible with the
    # reference's idx_to_keypoints, features.py:283)
    regs_rev = ref_ba.traverse(
        imgs, ref_st.idx_to_keypoints(matches, kpts), badjust="incr")
    m_rev = ref_st.stitch(
        [ref_ba.Image(r.img.copy(), r.rot.copy(), r.intr.copy())
         for r in regs_rev], blender=ref_st.multiband_blend)
    p_rev, sy_r, sx_r = psnr_subpixel(m_ours, m_rev)
    out["shared_matchgraph_ref_ba_db"] = {"psnr": round(p_rev, 2),
                                          "shift": [sy_r, sx_r]}
    print(f"shared match graph (our matches -> ref BA+render) vs our "
          f"mosaic: {p_rev:.2f} dB", flush=True)

    # the deconflated version of the cell above: compare the reference's
    # BA on OUR matches against OUR pipeline at the reference's exact LM
    # stop (m_par: polish=False). Both sides now share the match graph
    # AND the optimizer schedule semantics, so the residual is pure BA
    # implementation difference on our matches — the mirror of
    # shared_matchgraph_parity_db (which shares the REFERENCE's matches).
    # Together the two parity cells split the independent e2e gap into
    # "BA implementation" (these cells) vs "front-end match graph" (the
    # rest).
    p_rp, sy_rp, sx_rp = psnr_subpixel(m_par, m_rev)
    out["shared_matchgraph_ref_ba_parity_db"] = {"psnr": round(p_rp, 2),
                                                 "shift": [sy_rp, sx_rp]}
    print(f"our matches, both at reference LM stop (ref BA vs our BA): "
          f"{p_rp:.2f} dB", flush=True)

    # --- registration error vs synthetic ground truth (accounts for the
    # e2e PSNR numerically: two *independent* ML estimates each carry a
    # noise floor vs GT; their difference — not render fidelity — bounds
    # the mosaic PSNR. implied_px_shift ~= the texture displacement.)
    out["reg_vs_ground_truth"] = {
        "ours": reg_errors(regions, rots_gt, focal_gt),
        "reference": reg_errors(regions_ref, rots_gt, focal_gt),
    }
    print("registration vs GT:", out["reg_vs_ground_truth"], flush=True)

    # --- each pipeline vs a ground-truth-camera mosaic from its OWN
    # renderer: the per-pipeline true end-to-end error, free of the other
    # pipeline's noise. The GT rotations are gauge-aligned to each
    # estimate first (global rotation is unobservable; the estimates are
    # anchored at an identity seed + straightening): G = the closed-form
    # Wahba solution min_G sum ||G R_gt_i - R_est_i||_F^2.
    def align_gt(rots_est):
        # world-frame gauge: R maps world->camera, so the unobservable
        # global rotation acts on the RIGHT (straighten is also a right
        # multiplication); solve min_G sum ||R_gt_i G - R_est_i||_F^2
        m = sum(rg.T @ re for re, rg in zip(rots_est, rots_gt))
        uu, _, vt = np.linalg.svd(m)
        g = uu @ vt
        if np.linalg.det(g) < 0:
            g = uu @ np.diag([1, 1, -1]) @ vt
        return [rg @ g for rg in rots_gt]

    intr_gt = np.diag([focal_gt, focal_gt, 1.0])
    gt_r_ours = align_gt([r.rot for r in regions])
    gt_ours = [PanoImage(im.copy(), r.copy(), intr_gt.copy())
               for im, r in zip(imgs, gt_r_ours)]
    m_gt_ours = render.stitch(gt_ours, blender="multiband")
    gt_r_ref = align_gt([r.rot for r in regions_ref])
    gt_ref = [ref_ba.Image(im.copy(), r.copy(), intr_gt.copy())
              for im, r in zip(imgs, gt_r_ref)]
    m_gt_ref = ref_st.stitch(gt_ref, blender=ref_st.multiband_blend)
    p_o, dy_o, dx_o = psnr_subpixel(m_ours, m_gt_ours)
    p_r, dy_r, dx_r = psnr_subpixel(m_ref, m_gt_ref)
    out["vs_gt_mosaic_psnr_db"] = {
        "ours": round(p_o, 2), "ours_shift": [dy_o, dx_o],
        "reference": round(p_r, 2), "reference_shift": [dy_r, dx_r],
    }
    print("vs GT mosaic:", out["vs_gt_mosaic_psnr_db"], flush=True)

    # --- equalize path end-to-end: per-view gain perturbations, both
    # pipelines run with exposure compensation, mosaics compared
    # (previously only find_gains unit parity; stitcher.py:24-66)
    #
    # REFERENCE BUG, worked around for the comparison: equalize_gains
    # (stitcher.py:56-57) calls cv2.warpPerspective with
    # BORDER_TRANSPARENT but no explicit dst; OpenCV then leaves the
    # destination UNINITIALIZED outside the warped quad, the garbage
    # alpha passes the `overlap[..., 3] != 0` mask, and the overlap
    # means (hence all gains) come out NaN -> the reference's -e mosaic
    # is garbage whenever the allocator returns non-zeroed pages
    # (verified in this environment: overlap max 3.3e38, gains all-NaN).
    # Passing a zeroed dst reproduces the reference's documented intent,
    # which is also what our implementation computes (constant-0 border,
    # render.py equalize_gains).
    _orig_warp = cv2.warpPerspective

    def _zeroed_dst_warp(src, m, dsize, dst=None, **kw):
        if dst is None and kw.get("borderMode") == cv2.BORDER_TRANSPARENT:
            dst = np.zeros((dsize[1], dsize[0]) + src.shape[2:], src.dtype)
        return _orig_warp(src, m, dsize, dst=dst, **kw)

    cv2.warpPerspective = _zeroed_dst_warp
    rng = np.random.default_rng(11)
    gains_true = rng.uniform(0.7, 1.3, len(imgs))
    imgs_g = [np.clip(im.astype(np.float64) * g, 0, 255).astype(np.uint8)
              for im, g in zip(imgs, gains_true)]
    kpts_g, matches_g = ref_feat.matching(imgs_g)
    regs_ref_g = ref_ba.traverse(
        imgs_g, ref_st.idx_to_keypoints(matches_g, kpts_g), badjust="incr")
    m_ref_eq = ref_st.stitch(
        [ref_ba.Image(r.img.copy(), r.rot.copy(), r.intr.copy())
         for r in regs_ref_g], blender=ref_st.multiband_blend,
        equalize=True)
    dev_g = to_device(imgs_g)
    kpts_o, matches_o = matching(imgs_g, seed=0, dev_images=dev_g)
    regs_o_g = traverse(imgs_g, idx_to_keypoints(matches_o, kpts_o),
                        badjust="incr")
    m_ours_eq = render.stitch(regs_o_g, blender="multiband",
                              equalize=True, dev_images=dev_g)
    # non-equalized mosaics on the SAME perturbed registrations: the
    # e2e number is dominated by registration drift on this harder
    # scene, so the equalize component's contribution is the DELTA
    m_ref_ne = ref_st.stitch(
        [ref_ba.Image(r.img.copy(), r.rot.copy(), r.intr.copy())
         for r in regs_ref_g], blender=ref_st.multiband_blend)
    m_ours_ne = render.stitch(regs_o_g, blender="multiband",
                              dev_images=dev_g)
    # shared-registration equalize parity: both renderers consume the
    # reference's registration, isolating gain estimation + application
    # from registration divergence (the equalize analogue of
    # render_parity_psnr_db)
    shared_eq = [PanoImage(r.img.copy(), r.rot.copy(), r.intr.copy())
                 for r in regs_ref_g]
    m_shared_eq = render.stitch(shared_eq, blender="multiband",
                                equalize=True)
    cv2.warpPerspective = _orig_warp
    p_eq, sy_e, sx_e = psnr_subpixel(m_ours_eq, m_ref_eq)
    p_ne, _, _ = psnr_subpixel(m_ours_ne, m_ref_ne)
    p_sh = psnr(m_shared_eq, m_ref_eq)
    out["equalize_quality_db"] = {
        "shared_registration_parity": round(p_sh, 2),
        "e2e_aligned": round(p_eq, 2), "e2e_shift": [sy_e, sx_e],
        "e2e_no_equalize_aligned": round(p_ne, 2),
        "gain_spread_true": round(float(gains_true.std()), 3),
        "note": "reference run with zeroed-dst fix for its "
                "uninitialized-BORDER_TRANSPARENT bug (stitcher.py:56)",
    }
    print(f"equalize shared-reg parity: {p_sh:.2f} dB | e2e "
          f"{p_eq:.2f} dB (no-equalize e2e {p_ne:.2f} dB)", flush=True)

    cv2.imwrite(os.path.join(ROOT, "benchmarks", "mosaic_gt.png"),
                m_gt_ours)
    cv2.imwrite(os.path.join(ROOT, "benchmarks", "mosaic_ref.png"), m_ref)
    cv2.imwrite(os.path.join(ROOT, "benchmarks", "mosaic_shared_reg.png"),
                m_shared)
    cv2.imwrite(os.path.join(ROOT, "benchmarks", "mosaic_ours.png"), m_ours)
    with open(os.path.join(ROOT, "benchmarks", "QUALITY.json"), "w") as fid:
        json.dump(out, fid, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
