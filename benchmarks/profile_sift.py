"""Substage profile of sift_extract on the real TPU.

Times PREFIXES of the production ``sift_extract`` program itself (its
static ``upto`` argument stops after a named stage and returns a scalar
checksum), attributing cost by subtraction:

  gauss   : base image + Gaussian stacks + DoG for all octaves
  cand    : + approx_max_k candidate selection
  refine  : + dense Newton-step-field refinement + survivor compaction
  patch   : + patch extraction / gradients
  full    : sift_extract (adds orientation + descriptor + global top-k)

Round 3 built hand-maintained truncated copies of the octave loop, and
long cold compiles of the deep blur-chain programs can kill the relay's
TPU worker (observed: the same 9-octave program crashes the worker in
one window and cold-compiles fine in 128 s in another). Two defenses:
each stage runs in its OWN subprocess (a worker crash loses one stage
attempt, not the run) with one retry, and the programs are prefixes of
the production ``sift_extract`` itself rather than truncated copies.

Run: python benchmarks/profile_sift.py
"""
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402
import jax  # noqa: E402

from benchmarks.measure_baseline import bench_dataset  # noqa: E402
from pano360_tpu.features import sift as S  # noqa: E402


def force(out):
    # sync the LAST leaf: device execution is in-order, so the final
    # chunk's readback bounds all queued work
    x = [y for y in jax.tree_util.tree_leaves(out) if hasattr(y, "dtype")][-1]
    np.asarray(x.reshape(-1)[0])
    return out


def t(label, fn, n=5):
    force(fn())
    times = []
    for _ in range(n):
        t0 = time.time()
        force(fn())
        times.append(time.time() - t0)
    print(f"{label:24s} {sorted(times)[n // 2]:7.3f}s  "
          f"(all {[round(x, 3) for x in times]})", flush=True)
    return sorted(times)[n // 2]


def run_stage(stage: str) -> None:
    """Child process: time one stage, print ``STAGE <name> <median>``."""
    imgs, _, _ = bench_dataset()
    # host-computed gray stack device_put from numpy (the production
    # pipeline's device-side bgr2gray feeds the same values; the
    # programs are data-independent so the cost is identical)
    gray_np = (np.stack(imgs).astype(np.float32) / 255.0)
    gray_np = (gray_np[..., 0] * 0.114 + gray_np[..., 1] * 0.587
               + gray_np[..., 2] * 0.299).astype(np.float32)
    # production batch size: the pipeline dispatches fixed 4-image
    # batches (one compile per resolution); a single 15-image dispatch
    # also OOMs HBM with the dense Newton-step field at bench scale
    bs = 4
    pad = -len(gray_np) % bs
    if pad:
        gray_np = np.concatenate([gray_np, gray_np[-1:].repeat(pad, 0)])
    chunks = [jax.device_put(gray_np[i:i + bs])
              for i in range(0, len(gray_np), bs)]
    print(f"gray stack: {gray_np.shape} in {len(chunks)}x{bs} batches",
          flush=True)
    cfg = S.SiftConfig(
        gauss_mode=os.environ.get("SIFT_GAUSS", "incremental"),
        patch_dtype=os.environ.get("SIFT_PATCH_DTYPE", "float32"))
    med = t(stage, lambda: [S.sift_extract(c, cfg, upto=stage)
                            for c in chunks])
    print(f"STAGE {stage} {med:.4f}", flush=True)


def main():
    stages = ["gauss", "cand", "refine", "patch", "full"]
    meds = {}
    for stage in stages:
        for attempt in (1, 2):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), stage],
                capture_output=True, text=True, timeout=1800)
            out = proc.stdout
            line = [ln for ln in out.splitlines()
                    if ln.startswith("STAGE ")]
            if line:
                meds[stage] = float(line[0].split()[2])
                print(out.rstrip(), flush=True)
                break
            print(f"[{stage}] attempt {attempt} failed "
                  f"(rc={proc.returncode}):\n"
                  f"{(proc.stderr or '').splitlines()[-1:]}", flush=True)
        else:
            meds[stage] = float("nan")
    print("attribution (median deltas):", flush=True)
    prev = 0.0
    for stage in stages:
        print(f"  {stage:10s} {meds[stage] - prev:7.3f}s "
              f"(cum {meds[stage]:.3f}s)", flush=True)
        prev = meds[stage]


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_stage(sys.argv[1])
    else:
        main()
