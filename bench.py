"""Benchmark: end-to-end stitch of a CMU2-like dataset on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}

``vs_baseline`` is the speedup over the measured CPU reference on the same
dataset (BASELINE_MEASURED.json; regenerate with
``python benchmarks/measure_baseline.py``). The timed region is the full
pipeline (matching + registration + render) after one warm-up run to
exclude XLA compilation, matching how a deployed service would run.
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np  # noqa: E402

from benchmarks.measure_baseline import bench_dataset  # noqa: E402
from pano360_tpu.pipeline import matching, idx_to_keypoints  # noqa: E402
from pano360_tpu.register import traverse  # noqa: E402
from pano360_tpu import render  # noqa: E402


def run_pipeline(imgs, seed=0):
    from pano360_tpu.pipeline import upload_extract
    dev, feats = upload_extract(imgs)      # upload overlapped with SIFT
    kpts, matches = matching(imgs, seed=seed, dev_images=dev, feats=feats)
    regions = traverse(imgs, idx_to_keypoints(matches, kpts),
                       badjust="incr")
    mosaic = render.stitch(regions, blender="multiband", dev_images=dev)
    return mosaic


def main():
    imgs, _, _ = bench_dataset()

    # warm-up: compile every stage at the benchmark shapes
    t0 = time.time()
    run_pipeline(imgs, seed=0)
    warm = time.time() - t0

    # steady state: median of 5 runs (the relay link's transfer rate
    # swings 18-86 MB/s between windows, adding +-0.5 s of run-to-run
    # noise that a small sample count conflates with pipeline time)
    samples = []
    for _ in range(5):
        t0 = time.time()
        mosaic = run_pipeline(imgs, seed=0)
        samples.append(time.time() - t0)
    elapsed = sorted(samples)[len(samples) // 2]

    baseline_path = os.path.join(ROOT, "BASELINE_MEASURED.json")
    vs_baseline = 0.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as fid:
            ref = json.load(fid)
        vs_baseline = ref["reference"]["e2e_s"] / elapsed

    print(json.dumps({
        "metric": "e2e_stitch_cmu2like_15x1mpix",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(vs_baseline, 2),
    }), flush=True)
    # extra detail on stderr (not part of the contract line): the relay
    # link rate swings 18-86 MB/s between windows and bounds e2e from
    # below (45 MB upload rides the critical path), so record it
    import jax
    import numpy as _np
    probe = _np.zeros((8 << 20,), _np.uint8)
    t0 = time.time()
    _np.asarray(jax.device_put(probe))[0]
    mbps = (2 * probe.nbytes / 1e6) / max(time.time() - t0, 1e-9)
    print(f"# warmup={warm:.1f}s samples={[round(s, 3) for s in samples]} "
          f"mosaic={mosaic.shape} link~{mbps:.0f}MB/s(roundtrip)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
