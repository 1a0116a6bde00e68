"""Measure the CPU reference pipeline on the benchmark dataset.

The reference repo publishes no numbers (BASELINE.md), so the baseline is
measured by running /root/reference end-to-end (SIFT+FLANN+RANSAC matching,
incremental LM bundle adjustment, multiband render) on the same synthetic
dataset bench.py uses. Results land in BASELINE_MEASURED.json next to the
repo root.

Run: python benchmarks/measure_baseline.py
"""
import json
import os
import sys
import time
import types

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# reference import shims (old cv2/numpy APIs)
import cv2
if not hasattr(cv2, "xfeatures2d"):
    cv2.xfeatures2d = types.SimpleNamespace(SIFT_create=cv2.SIFT_create)
if "object" not in np.__dict__:
    np.object = object
sys.path.insert(0, "/root/reference")

from pano360_tpu import synth  # noqa: E402

BENCH_SEED = 42
BENCH_VIEWS = 15
BENCH_SHAPE = (864, 1152)   # ~1 Mpix per view, CMU2-like scale
BENCH_OVERLAP = 0.45


def bench_dataset():
    imgs, rots, focal = synth.make_views(
        n_views=BENCH_VIEWS, shape=BENCH_SHAPE, overlap=BENCH_OVERLAP,
        seed=BENCH_SEED)
    return [(im * 255).astype(np.uint8) for im in imgs], rots, focal


def main():
    import features as ref_feat
    import stitcher as ref_st
    import bundle_adj as ref_ba

    imgs, _, _ = bench_dataset()
    print(f"dataset: {len(imgs)} views of {imgs[0].shape}", flush=True)

    t0 = time.time()
    kpts, matches = ref_feat.matching(imgs)
    t_match = time.time() - t0
    print(f"reference matching: {t_match:.2f}s", flush=True)

    t0 = time.time()
    regions = ref_ba.traverse(imgs, ref_st.idx_to_keypoints(matches, kpts),
                              badjust="incr")
    t_reg = time.time() - t0
    print(f"reference registration: {t_reg:.2f}s ({len(regions)} placed)",
          flush=True)

    t0 = time.time()
    mosaic = ref_st.stitch(regions, blender=ref_st.multiband_blend)
    t_stitch = time.time() - t0
    print(f"reference mosaic: {t_stitch:.2f}s {mosaic.shape}", flush=True)

    out = {
        "dataset": {"views": BENCH_VIEWS, "shape": list(BENCH_SHAPE),
                    "overlap": BENCH_OVERLAP, "seed": BENCH_SEED},
        "reference": {
            "matching_s": round(t_match, 3),
            "registration_s": round(t_reg, 3),
            "mosaic_s": round(t_stitch, 3),
            "e2e_s": round(t_match + t_reg + t_stitch, 3),
        },
        "mosaic_shape": list(mosaic.shape),
    }
    path = os.path.join(ROOT, "BASELINE_MEASURED.json")
    with open(path, "w") as fid:
        json.dump(out, fid, indent=2)
    print(json.dumps(out))
    # save the reference mosaic as the golden for PSNR comparison
    cv2.imwrite(os.path.join(ROOT, "benchmarks", "golden_mosaic.png"),
                mosaic)


if __name__ == "__main__":
    main()
