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
    p_o, dy_o, dx_o = psnr_aligned(m_ours, m_gt_ours)
    p_r, dy_r, dx_r = psnr_aligned(m_ref, m_gt_ref)
    out["vs_gt_mosaic_psnr_db"] = {
        "ours": round(p_o, 2), "ours_shift": [dy_o, dx_o],
        "reference": round(p_r, 2), "reference_shift": [dy_r, dx_r],
    }
    print("vs GT mosaic:", out["vs_gt_mosaic_psnr_db"], flush=True)

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
