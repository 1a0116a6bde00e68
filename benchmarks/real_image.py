"""End-to-end validation on a REAL photograph (VERDICT r3 item 6).

Every other quality number rests on one synthetic value-noise world
(synth.world_texture), which is friendly to SIFT. This harness builds a
world from a real photograph — matplotlib's bundled ``grace_hopper.jpg``
(public-domain US government portrait), the only real photo shipped in
the environment — mirror-tiled around the azimuth with low-texture
faded bands above and below: repeated structure + low-texture regions
are exactly the failure modes value noise cannot exhibit (reference
validated by eye on real sets, Readme.md:87-100).

Renders a rotating-camera sweep (same image-formation model as
synth.make_views), runs BOTH pipelines end-to-end (multiband), and
records ours-vs-reference aligned PSNR, each side vs a ground-truth-
camera mosaic, and registration errors vs the true rotations.

Writes REAL_IMAGE.json + mosaic_real_{ours,ref}.png under benchmarks/.
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
if "object" not in np.__dict__:
    np.object = object
sys.path.insert(0, "/root/reference")

from benchmarks.compare_quality import psnr_subpixel, reg_errors  # noqa


def real_world_texture(height: int = 1024, width: int = 2048):
    """Equirect world from the bundled real photo.

    The photo band is mirror-tiled across the full azimuth (repeated +
    mirrored structure); rows above/below fade into blurred low-texture
    extensions of the edge rows (a sky/floor analog).
    """
    import matplotlib.cbook as cbook
    from PIL import Image

    p = cbook.get_sample_data("grace_hopper.jpg", asfileobj=False)
    photo = np.asarray(Image.open(p)).astype(np.float32) / 255.0  # RGB
    ph, pw = photo.shape[:2]

    reps = -(-width // pw)
    tiles = []
    for k in range(reps):
        tiles.append(photo[:, ::-1] if k % 2 else photo)
    band = np.concatenate(tiles, axis=1)[:, :width]

    tex = np.zeros((height, width, 3), np.float32)
    y0 = (height - ph) // 2
    tex[y0:y0 + ph] = band
    # low-texture fades: edge row + vertical cosine fade to its mean
    top = band[0]
    bot = band[-1]
    for row, edge in ((np.arange(y0), top),
                      (np.arange(y0 + ph, height), bot)):
        if not len(row):
            continue
        d = np.abs(row[:, None, None]
                   - (y0 if edge is top else y0 + ph - 1)) / max(y0, 1)
        fade = 0.5 * (1 + np.cos(np.clip(d, 0, 1) * np.pi))
        tex[row] = edge[None] * fade + edge.mean() * (1 - fade)
    return tex


def main():
    import features as ref_feat
    import stitcher as ref_st
    import bundle_adj as ref_ba

    from pano360_tpu import render, synth
    from pano360_tpu.pipeline import matching, idx_to_keypoints, to_device
    from pano360_tpu.register import traverse, PanoImage

    tex = real_world_texture()
    views, rots_gt, focal_gt = synth.make_views(
        n_views=8, shape=(480, 640), overlap=0.5, seed=13, texture=tex)
    imgs = [(v * 255).astype(np.uint8) for v in views]
    print(f"real-photo dataset: {len(imgs)} views of {imgs[0].shape}, "
          f"focal {focal_gt:.1f}", flush=True)
    out = {"views": len(imgs), "shape": list(imgs[0].shape[:2])}

    # reference e2e
    kpts_r, matches_r = ref_feat.matching(imgs)
    regs_ref = ref_ba.traverse(
        imgs, ref_st.idx_to_keypoints(matches_r, kpts_r), badjust="incr")
    m_ref = ref_st.stitch(
        [ref_ba.Image(r.img.copy(), r.rot.copy(), r.intr.copy())
         for r in regs_ref], blender=ref_st.multiband_blend)
    print(f"reference: {len(regs_ref)} placed, mosaic {m_ref.shape}",
          flush=True)

    # ours e2e
    dev = to_device(imgs)
    kpts, matches = matching(imgs, seed=0, dev_images=dev)
    regs = traverse(imgs, idx_to_keypoints(matches, kpts), badjust="incr")
    m_ours = render.stitch(regs, blender="multiband", dev_images=dev)
    print(f"ours: {len(regs)} placed, mosaic {m_ours.shape}", flush=True)
    out["placed"] = {"ours": len(regs), "reference": len(regs_ref)}

    p_al, sy, sx = psnr_subpixel(m_ours, m_ref)
    out["e2e_psnr_aligned_db"] = {"psnr": round(p_al, 2),
                                  "shift": [sy, sx]}
    print(f"ours vs reference (aligned): {p_al:.2f} dB", flush=True)

    out["reg_vs_ground_truth"] = {
        "ours": reg_errors(regs, rots_gt, focal_gt),
        "reference": reg_errors(regs_ref, rots_gt, focal_gt),
    }
    print("registration vs GT:", out["reg_vs_ground_truth"], flush=True)

    # each side vs a ground-truth-camera mosaic from its own renderer
    def align_gt(rots_est):
        m = sum(rg.T @ re for re, rg in zip(rots_est, rots_gt))
        uu, _, vt = np.linalg.svd(m)
        g = uu @ vt
        if np.linalg.det(g) < 0:
            g = uu @ np.diag([1, 1, -1]) @ vt
        return [rg @ g for rg in rots_gt]

    intr_gt = np.diag([focal_gt, focal_gt, 1.0])
    gt_ours = [PanoImage(im.copy(), r.copy(), intr_gt.copy())
               for im, r in zip(imgs, align_gt([r.rot for r in regs]))]
    m_gt_o = render.stitch(gt_ours, blender="multiband")
    gt_ref = [ref_ba.Image(im.copy(), r.copy(), intr_gt.copy())
              for im, r in zip(imgs, align_gt([r.rot for r in regs_ref]))]
    m_gt_r = ref_st.stitch(gt_ref, blender=ref_st.multiband_blend)
    p_o, *_ = psnr_subpixel(m_ours, m_gt_o)
    p_r, *_ = psnr_subpixel(m_ref, m_gt_r)
    out["vs_gt_mosaic_psnr_db"] = {"ours": round(p_o, 2),
                                   "reference": round(p_r, 2)}
    print(f"vs GT mosaic: ours {p_o:.2f} dB, reference {p_r:.2f} dB",
          flush=True)

    cv2.imwrite(os.path.join(ROOT, "benchmarks", "mosaic_real_ours.png"),
                m_ours)
    cv2.imwrite(os.path.join(ROOT, "benchmarks", "mosaic_real_ref.png"),
                m_ref)
    with open(os.path.join(ROOT, "benchmarks", "REAL_IMAGE.json"),
              "w") as fid:
        json.dump(out, fid, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
