"""Attribute cold-start cost: device init vs per-stage XLA/Mosaic compiles.

CONFIGS.json's config-1 cold (826 s in the round-5 sweep window) is the
first run in a fresh process; this probe separates what that number is
made of, at config-1's exact shapes (6 views, 300x400 after shrink 2):

  - device init + first trivial dispatch (tunnel bring-up)
  - SIFT extract compile (the big program; PANO_SIFT_GAUSS both modes)
  - match / traverse / stitch compiles

Run with a FRESH compile cache to see true cold time:
  JAX_COMPILATION_CACHE_DIR=/tmp/fresh_cache python benchmarks/profile_cold.py
"""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

MODE = os.environ.get("PANO_SIFT_GAUSS", "pallas")


def main():
    t_start = time.time()
    import numpy as np
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    np.asarray(jnp.zeros((8, 128)) + 1.0)
    t_init = time.time() - t0
    print(f"device init + first trivial dispatch: {t_init:7.1f}s",
          flush=True)

    from pano360_tpu import synth
    from pano360_tpu.pipeline import matching, idx_to_keypoints
    from pano360_tpu.register import traverse
    from pano360_tpu import render

    imgs, _, _ = synth.make_views(n_views=6, shape=(600, 800),
                                  overlap=0.5, seed=10)
    imgs = [(im[::2, ::2] * 255).astype(np.uint8) for im in imgs]

    t0 = time.time()
    kpts, matches = matching(imgs, seed=0)
    t_match = time.time() - t0
    print(f"matching cold (SIFT gauss_mode={MODE} + match graph):"
          f" {t_match:7.1f}s", flush=True)

    t0 = time.time()
    regions = traverse(imgs, idx_to_keypoints(matches, kpts),
                       badjust="none")
    t_trav = time.time() - t0
    print(f"traverse cold (ba none): {t_trav:7.1f}s", flush=True)

    t0 = time.time()
    render.stitch(regions, blender="linear")
    t_stitch = time.time() - t0
    print(f"stitch cold (linear): {t_stitch:7.1f}s", flush=True)
    print(f"TOTAL (incl. imports): {time.time() - t_start:7.1f}s",
          flush=True)


if __name__ == "__main__":
    main()
