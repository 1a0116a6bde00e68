"""A/B SIFT front-end knobs on the real-texture world (our side only).

REAL_IMAGE.json recorded ours 38.75 dB vs the reference's 41.31 dB
against each side's own ground-truth-camera mosaic — both place 8/8
with ~0.06 deg mean rotation error, so the gap is in the tail of our
registration errors (max rel-rot 0.146 vs 0.098 deg). Two front-end
suspects, both introduced for speed with quality gates run only on the
value-noise world:

  patch_dtype='bfloat16' (round-4 default) — descriptor quantization
  cand_topk='approx' (lax.approx_max_k, ~2% weakest-candidate loss)

This harness sweeps the 2x2 grid on the real-texture world and prints
registration errors + vs-GT mosaic PSNR per cell. Run:
    python benchmarks/ab_real_quality.py
Optional argv override the swept values (comma lists):
    python benchmarks/ab_real_quality.py float32 approx incremental,pallas
sweeps gauss_mode at the production patch_dtype/cand_topk (the gate
used before flipping the fused Pallas octave kernel default), and a
4th argv sweeps descr_mode (grid vs cv2-exact dense):
    python benchmarks/ab_real_quality.py float32 exact pallas grid,dense
"""
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from benchmarks.compare_quality import psnr_subpixel, reg_errors  # noqa
from benchmarks.real_image import real_world_texture  # noqa


def main():
    from pano360_tpu import render, synth
    from pano360_tpu.pipeline import matching, idx_to_keypoints, to_device
    from pano360_tpu.register import traverse, PanoImage
    from pano360_tpu.features import sift as S
    import pano360_tpu.pipeline as pl

    tex = real_world_texture()
    views, rots_gt, focal_gt = synth.make_views(
        n_views=8, shape=(480, 640), overlap=0.5, seed=13, texture=tex)
    imgs = [(v * 255).astype(np.uint8) for v in views]
    dev = to_device(imgs)
    intr_gt = np.diag([focal_gt, focal_gt, 1.0])

    def align_gt(rots_est):
        m = sum(rg.T @ re for re, rg in zip(rots_est, rots_gt))
        uu, _, vt = np.linalg.svd(m)
        g = uu @ vt
        if np.linalg.det(g) < 0:
            g = uu @ np.diag([1, 1, -1]) @ vt
        return [rg @ g for rg in rots_gt]

    dtypes = (sys.argv[1].split(",") if len(sys.argv) > 1
              else ("bfloat16", "float32"))
    cands = (sys.argv[2].split(",") if len(sys.argv) > 2
             else ("approx", "exact"))
    gmodes = (sys.argv[3].split(",") if len(sys.argv) > 3
              else ("incremental",))
    dmodes = (sys.argv[4].split(",") if len(sys.argv) > 4
              else ("grid",))
    out = {}
    for patch_dtype in dtypes:
        for cand in cands:
            for gmode, dmode in [(g, dm) for g in gmodes for dm in dmodes]:
                cfg = S.SiftConfig(patch_dtype=patch_dtype, cand_topk=cand,
                                   gauss_mode=gmode, descr_mode=dmode)
                feats = pl._gray_extract(dev, cfg)
                kpts, matches = matching(imgs, seed=0, dev_images=dev,
                                         feats=feats)
                regs = traverse(imgs, idx_to_keypoints(matches, kpts),
                                badjust="incr")
                m_ours = render.stitch(regs, blender="multiband",
                                       dev_images=dev)
                errs = reg_errors(regs, rots_gt, focal_gt)
                gt_ours = [PanoImage(im.copy(), r.copy(), intr_gt.copy())
                           for im, r in zip(
                               imgs, align_gt([r.rot for r in regs]))]
                m_gt = render.stitch(gt_ours, blender="multiband")
                p, *_ = psnr_subpixel(m_ours, m_gt)
                key = f"{patch_dtype}/{cand}"
                if len(gmodes) > 1 or gmode != "incremental":
                    key += f"/{gmode}"
                if len(dmodes) > 1 or dmode != "grid":
                    key += f"/{dmode}"
                out[key] = {"placed": len(regs), "vs_gt_db": round(p, 2),
                            **errs}
                print(key, json.dumps(out[key]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
