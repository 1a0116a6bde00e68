"""Run the five BASELINE.md benchmark configurations end-to-end.

Configs (BASELINE.md / BASELINE.json):
  1. CMU0-like:  SIFT+RANSAC, --ba none,  --blend linear,  shrink 2
  2. CMU2-like:  defaults (--ba incr, --blend multiband)
  3. LunchRoom-like: --equalize + multiband (gain-perturbed views)
  4. CMU1-like:  MSOP extractor path
  5. UAV-like:   long sequence, --ba last + --crop

Each runs on its own synthetic dataset (no reference datasets ship with the
environment). Prints one JSON line per config with timing and basic output
stats; writes CONFIGS.json.
"""
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pano360_tpu import synth  # noqa: E402
from pano360_tpu.cli import build_parser, run  # noqa: E402


def make_ds(tmp, name, n_views, shape, seed, gains=None):
    imgs, rots, focal = synth.make_views(n_views=n_views, shape=shape,
                                         overlap=0.5, seed=seed)
    if gains is not None:
        imgs = [np.clip(im * g, 0, 1) for im, g in zip(imgs, gains)]
    path = os.path.join(tmp, name)
    synth.write_dataset(path, imgs)
    return path


CONFIGS = [
    ("cmu0_like_ba-none_linear_s2",
     dict(n_views=6, shape=(600, 800), seed=10),
     ["-s", "2", "--ba", "none", "-b", "linear"]),
    ("cmu2_like_defaults",
     dict(n_views=10, shape=(600, 800), seed=11),
     ["-s", "2"]),
    ("lunchroom_like_equalize_multiband",
     dict(n_views=6, shape=(600, 800), seed=12,
          gains=[0.8, 1.15, 0.9, 1.2, 0.95, 1.1]),
     ["-s", "2", "-e"]),
    ("cmu1_like_msop",
     dict(n_views=5, shape=(480, 640), seed=13),
     ["-s", "2", "--detector", "msop", "-b", "linear"]),
    ("uav_like_ba-last_crop",
     dict(n_views=12, shape=(480, 640), seed=14),
     ["-s", "2", "--ba", "last", "-c"]),
]

# The capability headline the reference cannot touch: its 1400-px cap
# exists because CPU rendering is slow (stitcher.py:17,153-155); on TPU
# the exact Pallas warp removes the rationale. Rendered twice (auto ->
# Pallas kernel vs forced XLA gather) to record time + agreement.
HIGHRES = ("highres_flagship_maxres4000",
           dict(n_views=10, shape=(1080, 1440), seed=15),
           ["-s", "1", "--max-resolution", "4000"])


def main():
    import glob
    import tempfile
    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        for name, ds_kwargs, flags in CONFIGS:
            ds = make_ds(tmp, name, **ds_kwargs)
            cache = os.path.join(tmp, name + "_cache")
            os.makedirs(cache, exist_ok=True)
            args = build_parser().parse_args(
                [ds, *flags, "--cache-dir", cache])
            # cold: includes XLA compiles (amortized across runs by the
            # persistent compilation cache the CLI enables by default)
            t0 = time.time()
            run(args)
            cold = time.time() - t0
            # steady-state: drop the stage caches so the full pipeline
            # re-executes, but keep the compiled programs
            for f in glob.glob(os.path.join(cache, "*")):
                os.remove(f)
            t0 = time.time()
            mosaic = run(args)
            steady = time.time() - t0
            filled = float((mosaic.sum(-1) > 0).mean())
            results[name] = {
                "cold_s": round(cold, 2),
                "steady_s": round(steady, 2),
                "mosaic": list(mosaic.shape),
                "filled_frac": round(filled, 3),
            }
            print(json.dumps({name: results[name]}), flush=True)

        # high-res flagship: Pallas (auto) vs forced XLA gather
        name, ds_kwargs, flags = HIGHRES
        ds = make_ds(tmp, name, **ds_kwargs)
        row = {}
        mosaics = {}
        for warp in ("auto", "xla"):
            cache = os.path.join(tmp, f"{name}_{warp}_cache")
            os.makedirs(cache, exist_ok=True)
            args = build_parser().parse_args(
                [ds, *flags, "--warp", warp, "--cache-dir", cache])
            t0 = time.time()
            run(args)
            cold = time.time() - t0
            for f in glob.glob(os.path.join(cache, "*")):
                os.remove(f)
            t0 = time.time()
            mosaics[warp] = run(args)
            row[warp] = {"cold_s": round(cold, 2),
                         "steady_s": round(time.time() - t0, 2)}
        d = (mosaics["auto"].astype(np.float64)
             - mosaics["xla"].astype(np.float64))
        mse = float(np.mean(d * d))
        row["mosaic"] = list(mosaics["auto"].shape)
        row["pallas_vs_xla_psnr_db"] = round(
            99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse), 1)
        results[name] = row
        print(json.dumps({name: row}), flush=True)
        import cv2
        cv2.imwrite(os.path.join(ROOT, "benchmarks",
                                 "mosaic_highres4000.png"),
                    mosaics["auto"])
    results["note"] = (
        "cold_s = first run in a fresh process at never-before-compiled "
        "shapes: it is dominated by XLA/Mosaic compiles through the "
        "remote-compile tunnel (30-120 s per program, window-dependent) "
        "and amortizes to ~steady_s via the persistent compilation "
        "cache once a deployment has seen the shape; steady_s is the "
        "second run with stage caches dropped (programs cached)")
    with open(os.path.join(ROOT, "benchmarks", "CONFIGS.json"), "w") as fid:
        json.dump(results, fid, indent=2)


if __name__ == "__main__":
    main()
