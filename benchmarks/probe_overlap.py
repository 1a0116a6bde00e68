"""Does the relay overlap host->device transfers with running compute?

Measures, with forced readbacks:
  A: upload 45MB alone
  B: big compute alone (SIFT on resident stack)
  C: dispatch compute, then upload, then force both
If C ~= max(A, B): transfers ride under compute (overlap works).
If C ~= A + B: the relay serializes them (pipelining cannot help).

Run: python benchmarks/probe_overlap.py
"""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.measure_baseline import bench_dataset  # noqa: E402
from pano360_tpu.pipeline import _gray_extract  # noqa: E402
from pano360_tpu.features import sift as S  # noqa: E402


def force(out):
    x = [y for y in jax.tree_util.tree_leaves(out) if hasattr(y, "dtype")][0]
    np.asarray(x.reshape(-1)[0])
    return out


def main():
    imgs, _, _ = bench_dataset()
    host = np.stack(imgs)
    cfg = S.SiftConfig()
    dev = force(jax.device_put(host) * 1)

    # warm both programs
    force(jax.device_put(host).sum())
    force(_gray_extract(dev, cfg))

    for rep in range(3):
        t0 = time.time()
        force(jax.device_put(host).sum())
        ta = time.time() - t0

        t0 = time.time()
        force(_gray_extract(dev, cfg))
        tb = time.time() - t0

        t0 = time.time()
        feats = _gray_extract(dev, cfg)       # dispatch first (async)
        up = jax.device_put(host).sum()       # transfer behind it
        force(up)
        force(feats)
        tc = time.time() - t0
        print(f"rep{rep}: upload={ta:.3f}s compute={tb:.3f}s "
              f"both={tc:.3f}s (serial={ta + tb:.3f}, "
              f"overlap={max(ta, tb):.3f})", flush=True)


if __name__ == "__main__":
    main()
