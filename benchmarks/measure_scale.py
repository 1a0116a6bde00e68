"""Scale benchmark: how the TPU pipeline's advantage grows with load.

Runs our pipeline and the CPU reference on larger synthetic sweeps than
the flagship benchmark (25- and 50-view x 2.2 Mpix vs 15 x 1 Mpix) and
records end-to-end times into SCALE.json. The TPU pipeline's costs are
dominated by fixed dispatch overheads and the host link at the flagship
size, so its advantage should widen as real compute grows; the 50-view
row doubles the match graph (1225 pairs) and the blend region count to
show stitch cost stays sub-linear in N (patch footprints shrink as
views pack denser around the turn).
"""
import json
import os
import sys
import time
import types

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np  # noqa: E402
import cv2  # noqa: E402

if not hasattr(cv2, "xfeatures2d"):
    cv2.xfeatures2d = types.SimpleNamespace(SIFT_create=cv2.SIFT_create)
if not hasattr(np, "object"):
    np.object = object
sys.path.insert(0, "/root/reference")

from pano360_tpu import synth  # noqa: E402

SHAPE = (1296, 1728)   # ~2.2 Mpix
ROWS = [25, 50]


def make_imgs(n_views):
    imgs, _, _ = synth.make_views(n_views=n_views, shape=SHAPE,
                                  overlap=0.45, seed=7)
    return [(np.asarray(im) * 255).astype(np.uint8) for im in imgs]


def run_ours(imgs, stage_times):
    import jax
    from pano360_tpu.pipeline import (matching, idx_to_keypoints,
                                      upload_extract)
    from pano360_tpu.register import traverse
    from pano360_tpu import render

    def pipeline(rec=None):
        # upload+extract timed separately from matching: the image
        # upload moves N*H*W*3 bytes over the relay link, whose bulk
        # bandwidth swings ~40 MB/s-1 GB/s between windows — lumping it
        # into match_s once mis-attributed 8 s of congested upload to
        # the matcher (round-4 attribution, profile_match_scale.py)
        t0 = time.time()
        dev, feats = upload_extract(imgs)
        jax.block_until_ready(feats.xy)
        t1 = time.time()
        kpts, matches = matching(imgs, seed=0, dev_images=dev, feats=feats)
        t2 = time.time()
        regions = traverse(imgs, idx_to_keypoints(matches, kpts),
                           badjust="incr")
        t3 = time.time()
        mosaic = render.stitch(regions, blender="multiband", dev_images=dev)
        if rec is not None:
            rec["upload_extract_s"] = round(t1 - t0, 2)
            rec["match_s"] = round(t2 - t1, 2)
            rec["traverse_s"] = round(t3 - t2, 2)
            rec["stitch_s"] = round(time.time() - t3, 2)
        return mosaic

    pipeline()                     # warm-up (compiles)

    # one-off split probes: the production upload_extract interleaves
    # the two on purpose (batch k+1's transfer rides under batch k's
    # SIFT), so the honest decomposition is measured separately —
    # upload-only (device_put the same bytes, block) vs extract-only
    # (SIFT on already-resident batches). upload_only_s + extract_only_s
    # >= upload_extract_s when the overlap works; the delta is the
    # overlap won back. Link weather makes upload_only_s the volatile
    # term, so the implied link rate is recorded alongside.
    from pano360_tpu.features import sift as S
    from pano360_tpu.pipeline import _gray_extract
    bs = 4
    n = len(imgs)
    nb = -(-n // bs)
    padded = list(imgs) + [imgs[-1]] * (nb * bs - n)
    batches = [np.stack(padded[b * bs:(b + 1) * bs]) for b in range(nb)]
    t0 = time.time()
    chunks = [jax.device_put(b) for b in batches]
    jax.block_until_ready(chunks)
    upload_only = time.time() - t0
    cfg = S.SiftConfig()
    t0 = time.time()
    feats_probe = [_gray_extract(c, cfg) for c in chunks]
    jax.block_until_ready(feats_probe)
    extract_only = time.time() - t0
    nbytes = sum(b.nbytes for b in batches)
    stage_times["upload_only_s"] = round(upload_only, 2)
    stage_times["extract_only_s"] = round(extract_only, 2)
    stage_times["upload_bytes"] = nbytes
    stage_times["link_MBps"] = round(nbytes / 1e6 / max(upload_only, 1e-9),
                                     1)
    del chunks, feats_probe

    # 3 timed reps, keep the median total: the relay link's bulk
    # bandwidth swings ~40 MB/s-1 GB/s between windows and the upload
    # stage soaks the weather
    runs = []
    for _ in range(3):
        rec = {}
        t0 = time.time()
        mosaic = pipeline(rec)
        runs.append((time.time() - t0, rec))
    runs.sort(key=lambda r: r[0])
    med, rec = runs[1]
    stage_times.update(rec)
    stage_times["totals_all_reps_s"] = [round(r[0], 2) for r in runs]
    return med, mosaic.shape


def run_reference(imgs):
    import features as ref_feat
    import stitcher as ref_st
    import bundle_adj as ref_ba

    t0 = time.time()
    kpts, matches = ref_feat.matching(imgs)
    regions = ref_ba.traverse(
        imgs, ref_st.idx_to_keypoints(matches, kpts), badjust="incr")
    mosaic = ref_st.stitch(regions, blender=ref_st.multiband_blend)
    return time.time() - t0, mosaic.shape


def main():
    rows = []
    for n_views in ROWS:
        imgs = make_imgs(n_views)
        print(f"dataset: {n_views} x {SHAPE} "
              f"({np.stack(imgs).nbytes / 1e6:.0f} MB)", flush=True)

        stages = {}
        ours_s, ours_shape = run_ours(imgs, stages)
        print(f"ours: {ours_s:.2f} s -> {ours_shape} {stages}", flush=True)

        ref_s, ref_shape = run_reference(imgs)
        print(f"reference: {ref_s:.2f} s -> {ref_shape}", flush=True)

        rows.append({"n_views": n_views, "shape": list(SHAPE),
                     "ours_s": round(ours_s, 2), "ours_stages": stages,
                     "reference_s": round(ref_s, 2),
                     "speedup": round(ref_s / ours_s, 2)})
        with open(os.path.join(ROOT, "benchmarks", "SCALE.json"),
                  "w") as fid:
            json.dump({"rows": rows}, fid, indent=2)
        print(json.dumps(rows[-1]), flush=True)


if __name__ == "__main__":
    main()
