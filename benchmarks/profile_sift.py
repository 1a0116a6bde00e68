"""Substage profile of sift_extract on the real TPU.

Builds truncated jit programs from sift.py's internals and times them with
forced readbacks, attributing cost by subtraction:

  gauss   : base image + Gaussian stacks + DoG for all octaves
  cand    : + approx_max_k candidate selection
  refine  : + Newton refinement + survivor compaction
  patch   : + patch extraction / gradients
  full    : sift_extract (adds orientation + descriptor + global top-k)

Run: python benchmarks/profile_sift.py
"""
import functools
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from benchmarks.measure_baseline import bench_dataset  # noqa: E402
from pano360_tpu.features import sift as S  # noqa: E402
from pano360_tpu.ops.color import bgr2gray  # noqa: E402


def force(out):
    # sync the LAST leaf: device execution is in-order, so the final
    # chunk's readback bounds all queued work
    x = [y for y in jax.tree_util.tree_leaves(out) if hasattr(y, "dtype")][-1]
    np.asarray(x.reshape(-1)[0])
    return out


def t(label, fn, n=3):
    force(fn())
    times = []
    for _ in range(n):
        t0 = time.time()
        force(fn())
        times.append(time.time() - t0)
    print(f"{label:24s} {sorted(times)[n // 2]:7.3f}s  "
          f"(all {[round(x, 3) for x in times]})", flush=True)


def truncated(gray, cfg: S.SiftConfig, upto: str):
    """Re-run sift_extract's octave loop up to a named stage; returns a
    scalar checksum so XLA cannot DCE the work."""
    n, h0, w0 = gray.shape
    n_oct = S.n_octaves_for((h0, w0), cfg.upscale)
    base_shape = (2 * h0, 2 * w0) if cfg.upscale else (h0, w0)
    caps = S._octave_caps(cfg, n_oct, base_shape)
    s = cfg.n_layers

    base = S._base_image(gray.astype(jnp.float32), cfg)
    acc = jnp.float32(0)
    octv = base
    for o in range(n_oct):
        gauss = S._gaussian_stack(octv, cfg)
        dog = gauss[:, 1:] - gauss[:, :-1]
        if upto == "gauss":
            acc += jnp.sum(dog[:, 0, ::8, ::8])
        else:
            cap = min(caps[o], s * dog.shape[2] * dog.shape[3])
            l0, y0, x0, cand_ok = S._octave_candidates(dog, cfg, cap)
            if upto == "cand":
                acc += jnp.sum(x0) + jnp.sum(cand_ok)
            else:
                field = S._newton_step_field(dog)
                refine = jax.vmap(jax.vmap(
                    lambda dg, fl, a, b, c: S._refine_one(dg, fl, a, b, c,
                                                          cfg),
                    in_axes=(None, None, 0, 0, 0)), in_axes=(0, 0, 0, 0, 0))
                l, y, x, offs, contrast, ok = refine(dog, field, l0, y0, x0)
                ok = ok & cand_ok
                sel_cap = cap if cap < 1024 else max(cap >> cfg.sel_shift,
                                                     512)
                if sel_cap < cap:
                    score = jnp.where(ok, jnp.abs(contrast), -jnp.inf)
                    _, sel = lax.top_k(score, sel_cap)
                    take = jax.vmap(lambda a, ii: a[ii])
                    l, y, x = take(l, sel), take(y, sel), take(x, sel)
                    ok = take(ok, sel)
                if upto == "refine":
                    acc += jnp.sum(x) + jnp.sum(ok)
                else:   # patch
                    oh, ow = gauss.shape[2], gauss.shape[3]
                    ps = min(2 * S._PATCH_HALF + 2, oh, ow)
                    patch_fn = jax.vmap(jax.vmap(
                        lambda g, a, b, c: S._extract_patch(g, a, b, c, ps),
                        in_axes=(None, 0, 0, 0)), in_axes=(0, 0, 0, 0))
                    patches, pcy, pcx = patch_fn(gauss, l, y, x)
                    gxp, gyp = S._patch_grads(patches)
                    acc += jnp.sum(gxp[..., ::16, ::16])
        if o + 1 < n_oct:
            octv = gauss[:, s][:, ::2, ::2]
    return acc


def main():
    imgs, _, _ = bench_dataset()
    # NOTE: feeding the device-side bgr2gray result into the truncated
    # programs reproducibly crashed the relay's TPU worker (kernel
    # fault); a host-computed gray stack device_put from numpy is stable
    # and the compute cost is identical (data-independent programs).
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
    cfg = S.SiftConfig()

    for stage in ["gauss", "cand", "refine", "patch"]:
        fn = jax.jit(functools.partial(truncated, cfg=cfg, upto=stage))
        t(stage, lambda fn=fn: [fn(c) for c in chunks])

    t("full sift_extract", lambda: [S.sift_extract(c, cfg) for c in chunks])


if __name__ == "__main__":
    main()
