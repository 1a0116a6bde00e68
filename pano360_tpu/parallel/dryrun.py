"""Multi-chip dryrun: one distributed pipeline step on an n-device mesh.

Self-provisions the device mesh: when the process has fewer than the
requested number of devices (e.g. a single relay-attached TPU chip), it
forces the CPU backend with ``--xla_force_host_platform_device_count`` so
the full distributed step (data-parallel SIFT extraction, pair-parallel
ring matching, psum-reduced Gauss-Newton camera update; see
``pano360_tpu.parallel.mesh.distributed_step``) compiles and executes on
n virtual devices without n real chips.

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
    """Execute one distributed step over an n-device mesh (tiny shapes)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from pano360_tpu.features.sift import SiftConfig
    from pano360_tpu.parallel import make_mesh, distributed_step
    from pano360_tpu import synth

    if len(jax.devices()) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(jax.devices())} "
            f"({jax.default_backend()}); provision() must run before the "
            "backend initializes")

    mesh = make_mesh(n_devices)
    shape = (64, 96)
    imgs, _, _ = synth.make_views(
        n_views=n_devices, shape=shape, overlap=0.5, seed=0)
    gray = jnp.asarray(np.stack(
        [im.mean(axis=-1) for im in imgs]), jnp.float32)

    cfg = SiftConfig(max_kpts=128, upscale=False)
    params, n_inl = distributed_step(mesh, gray, cfg)
    params.block_until_ready()
    assert params.shape == (n_devices, 6), params.shape
    assert bool(jnp.all(jnp.isfinite(params))), "non-finite camera update"
    print(f"dryrun_multichip({n_devices}): ok on "
          f"{jax.default_backend()} x{n_devices}, params {params.shape}, "
          f"inliers {int(n_inl)}", flush=True)


def main(argv=None) -> None:
    n = int((argv or sys.argv[1:])[0]) if (argv or sys.argv[1:]) else 8
    provision(n)
    run(n)


if __name__ == "__main__":
    main()
