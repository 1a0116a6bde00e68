"""Non-ideal-scene robustness: sensor noise + vignetting + exposure drift.

The quality benchmarks ride the clean synthetic rotating-camera world —
the stitcher's own image-formation model, i.e. a best-case scene
(VERDICT r2 "missing #5": no real datasets ship in this environment and
the clean scenes exercise neither noise nor photometric non-idealities).
This benchmark degrades the same known-ground-truth scene the way a real
capture would:

- per-view exposure gain  g_i ~ U(0.8, 1.25)   (auto-exposure drift)
- radial vignetting       v(r) = 1 - 0.3 (r/r_max)^2
- additive Gaussian sensor noise, sigma = 2/255, then uint8 quantization

and runs BOTH pipelines (ours and the CPU reference, reference.features
/bundle_adj/stitcher) on identical uint8 inputs. Reported per pipeline:

- registration accuracy vs the known true rotations/focal,
- gauge-aligned PSNR of the mosaic against a ground-truth-camera mosaic
  rendered by the SAME renderer (isolates registration+blend robustness
  from renderer differences).

Writes ROBUSTNESS.json.
"""
import json
import os
import sys
import types

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import cv2  # noqa: E402
if not hasattr(cv2, "xfeatures2d"):
    cv2.xfeatures2d = types.SimpleNamespace(SIFT_create=cv2.SIFT_create)
if not hasattr(np, "object"):
    np.object = object
sys.path.insert(0, "/root/reference")

from benchmarks.compare_quality import psnr_subpixel, reg_errors  # noqa: E402


def degrade(imgs_f32, seed=23, gain_lo=0.8, gain_hi=1.25,
            vignette=0.3, noise_sigma=2.0 / 255.0):
    """Apply gain/vignette/noise to float [0,1] BGR views -> uint8."""
    rng = np.random.default_rng(seed)
    gains = rng.uniform(gain_lo, gain_hi, len(imgs_f32))
    out = []
    for im, g in zip(imgs_f32, gains):
        h, w = im.shape[:2]
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        r2 = (((yy - h / 2) ** 2 + (xx - w / 2) ** 2)
              / ((h / 2) ** 2 + (w / 2) ** 2))
        v = 1.0 - vignette * r2
        im = im * g * v[..., None]
        im = im + rng.normal(0, noise_sigma, im.shape).astype(np.float32)
        out.append(np.clip(np.round(im * 255), 0, 255).astype(np.uint8))
    return out, gains


def main():
    import features as ref_feat
    import stitcher as ref_st
    import bundle_adj as ref_ba

    from pano360_tpu import render, synth
    from pano360_tpu.pipeline import matching, idx_to_keypoints, to_device
    from pano360_tpu.register import traverse, PanoImage

    views, rots_gt, focal_gt = synth.make_views(
        n_views=10, shape=(480, 640), overlap=0.5, seed=13)
    imgs, gains = degrade(views)
    intr_gt = np.diag([focal_gt, focal_gt, 1.0])
    out = {"scene": {"views": len(imgs), "shape": [480, 640],
                     "gain_spread": round(float(gains.std()), 3),
                     "vignette": 0.3, "noise_sigma_255": 2.0}}

    # ground-truth-camera mosaics, one per renderer (shared gauge)
    gt_ours = [PanoImage(im.copy(), r.copy(), intr_gt.copy())
               for im, r in zip(imgs, rots_gt)]
    m_gt_ours = render.stitch(gt_ours, blender="multiband")
    gt_ref = [ref_ba.Image(im.copy(), r.copy(), intr_gt.copy())
              for im, r in zip(imgs, rots_gt)]
    m_gt_ref = ref_st.stitch(gt_ref, blender=ref_st.multiband_blend)

    # ours
    dev = to_device(imgs)
    kpts, matches = matching(imgs, seed=0, dev_images=dev)
    regions = traverse(imgs, idx_to_keypoints(matches, kpts),
                       badjust="incr")
    out["ours_reg"] = reg_errors(regions, rots_gt, focal_gt)
    out["ours_cameras_placed"] = len(regions)
    m_ours = render.stitch(regions, blender="multiband", dev_images=dev)
    p, sy, sx = psnr_subpixel(m_ours, m_gt_ours)
    out["ours_vs_gt_mosaic_db"] = {"psnr": round(p, 2), "shift": [sy, sx]}
    print("ours:", out["ours_reg"], out["ours_vs_gt_mosaic_db"],
          flush=True)

    # reference
    kpts_r, matches_r = ref_feat.matching(imgs)
    regions_ref = ref_ba.traverse(
        imgs, ref_st.idx_to_keypoints(matches_r, kpts_r), badjust="incr")
    out["ref_reg"] = reg_errors(regions_ref, rots_gt, focal_gt)
    out["ref_cameras_placed"] = len(regions_ref)
    m_ref = ref_st.stitch(
        [ref_ba.Image(r.img.copy(), r.rot.copy(), r.intr.copy())
         for r in regions_ref], blender=ref_st.multiband_blend)
    p_r, sy_r, sx_r = psnr_subpixel(m_ref, m_gt_ref)
    out["ref_vs_gt_mosaic_db"] = {"psnr": round(p_r, 2),
                                  "shift": [sy_r, sx_r]}
    print("reference:", out["ref_reg"], out["ref_vs_gt_mosaic_db"],
          flush=True)

    with open(os.path.join(ROOT, "benchmarks", "ROBUSTNESS.json"),
              "w") as fid:
        json.dump(out, fid, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
