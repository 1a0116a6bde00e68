"""A/B the Gaussian-stack construction modes on the real TPU.

Times the FULL production sift_extract program (4-image bench batches)
under gauss_mode='incremental' (the sequential cv2-parity chain) vs
'direct' (every layer from the shared base as fused slice sums), plus
the 'gauss'-prefix programs when they compile, printing medians.

Run: python benchmarks/ab_gauss.py [stage]
"""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402
import jax  # noqa: E402

from benchmarks.measure_baseline import bench_dataset  # noqa: E402
from pano360_tpu.features import sift as S  # noqa: E402


def force(out):
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
    med = sorted(times)[n // 2]
    print(f"{label:32s} {med:7.3f}s  (all {[round(x, 3) for x in times]})",
          flush=True)
    return med


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "full"
    imgs, _, _ = bench_dataset()
    gray_np = (np.stack(imgs).astype(np.float32) / 255.0)
    gray_np = (gray_np[..., 0] * 0.114 + gray_np[..., 1] * 0.587
               + gray_np[..., 2] * 0.299).astype(np.float32)
    bs = 4
    pad = -len(gray_np) % bs
    if pad:
        gray_np = np.concatenate([gray_np, gray_np[-1:].repeat(pad, 0)])
    chunks = [jax.device_put(gray_np[i:i + bs])
              for i in range(0, len(gray_np), bs)]
    print(f"gray stack: {gray_np.shape} in {len(chunks)}x{bs} batches "
          f"stage={stage}", flush=True)
    modes = (sys.argv[2].split(",") if len(sys.argv) > 2
             else ("incremental", "pallas"))
    for mode in modes:
        cfg = S.SiftConfig(gauss_mode=mode)
        t(f"{stage}[{mode}]",
          lambda cfg=cfg: [S.sift_extract(c, cfg, upto=stage)
                           for c in chunks])


if __name__ == "__main__":
    main()
