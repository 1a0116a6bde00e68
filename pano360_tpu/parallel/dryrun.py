"""Multi-chip dryrun: the PRODUCTION pipeline on an n-device mesh.

Runs ``pipeline.matching`` (extraction sharded over images, the O(N^2)
match graph sharded over pairs), ``register.traverse`` (bundle-adjustment
edges sharded, normal equations psum-reduced) and ``render.stitch`` (warp
sharded over regions, patches all-gathered) over the mesh, then asserts
the mosaic matches a single-device run of the same functions.

Self-provisions the device mesh: when the process has fewer than the
requested number of devices (e.g. a single relay-attached TPU chip), it
forces the CPU backend with ``--xla_force_host_platform_device_count`` so
the full pipeline compiles and executes on n virtual devices without n
real chips.

Must run before the jax backend initializes to take effect in-process;
``__graft_entry__.dryrun_multichip`` re-execs into this module in a fresh
subprocess when the parent process already initialized a backend.
"""
from __future__ import annotations

import os
import sys


def provision(n_devices: int) -> None:
    """Force an n-device backend if the current one is too small.

    Only effective before backend initialization. The axon sitecustomize
    pins ``jax_platforms`` to the TPU relay regardless of the
    ``JAX_PLATFORMS`` env var, so the platform override must go through
    the config API after importing jax (see tests/conftest.py).
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()

    import jax

    try:
        initialized = jax._src.xla_bridge.backends_are_initialized()
    except AttributeError:          # private API moved; assume the worst
        initialized = True
    if not initialized:
        jax.config.update("jax_platforms", "cpu")


def run(n_devices: int) -> None:
    """Run the PRODUCTION pipeline (matching -> traverse -> stitch) over
    an n-device mesh on tiny shapes and assert the mosaic matches the
    single-device run of the same functions (>= 50 dB PSNR; features and
    matches are bit-identical, and the bundle adjuster's deterministic
    grouped reduction — register._group_reduce — keeps the remaining
    divergence at the last-ulp level, measured >= 70 dB)."""
    import numpy as np
    import jax

    from pano360_tpu import render, synth
    from pano360_tpu.parallel import make_mesh
    from pano360_tpu.pipeline import idx_to_keypoints, matching
    from pano360_tpu.register import traverse

    if len(jax.devices()) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(jax.devices())} "
            f"({jax.default_backend()}); provision() must run before the "
            "backend initializes")

    mesh = make_mesh(n_devices)
    imgs, _, _ = synth.make_views(
        n_views=n_devices, shape=(64, 96), overlap=0.5, seed=0)
    # production inputs are uint8 BGR (cv2.imread convention)
    imgs = [np.clip(im * 255, 0, 255).astype(np.uint8) for im in imgs]

    def pipeline(use_mesh):
        kpts, matches = matching(imgs, max_kpts=256, seed=0, mesh=use_mesh)
        regions = traverse(imgs, idx_to_keypoints(matches, kpts),
                           badjust="incr", mesh=use_mesh)
        assert regions, "empty match graph in dryrun"
        return render.stitch(regions, blender="multiband", mesh=use_mesh)

    mosaic = pipeline(mesh)
    placed = mosaic.shape
    mosaic0 = pipeline(None)
    assert mosaic.shape == mosaic0.shape, (mosaic.shape, mosaic0.shape)
    diff = mosaic.astype(np.float64) - mosaic0.astype(np.float64)
    mse = float(np.mean(diff * diff))
    psnr = 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)
    assert psnr >= 50.0, f"mesh/single-device mosaic mismatch: {psnr:.1f} dB"
    print(f"dryrun_multichip({n_devices}): ok on "
          f"{jax.default_backend()} x{n_devices} — production "
          f"matching/traverse/stitch sharded over the mesh, mosaic "
          f"{placed[1]}x{placed[0]}, parity vs single-device "
          f"{psnr:.1f} dB", flush=True)


def main(argv=None) -> None:
    n = int((argv or sys.argv[1:])[0]) if (argv or sys.argv[1:]) else 8
    provision(n)
    run(n)


if __name__ == "__main__":
    main()
