"""pano360-tpu: a TPU-native panorama stitching framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
Banus/pano360 (reference mounted at /root/reference): SIFT & MSOP feature
extraction, brute-force MXU descriptor matching, massively parallel RANSAC
homography estimation, incremental Levenberg-Marquardt bundle adjustment,
exposure compensation, spherical/cylindrical backward warping and
none/linear/multiband blending — with native C++ components for the
sequential host-side hot loops and ``shard_map`` scale-out over device
meshes.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compile_cache():
    """Turn on JAX's persistent compilation cache (P360_COMPILE_CACHE=0
    disables).

    On relay-attached TPUs every XLA compile is a remote-service round
    trip (measured 90 s+ for a trivial matmul under congestion; ~500 s
    warmups for the full pipeline), so caching compiled executables
    across processes is a first-order cold-start win: a second process
    compiling the same program measures ~0 s. NOTE: the
    ``JAX_COMPILATION_CACHE_DIR`` env var alone does NOT enable the
    cache on this jax build — ``jax.config.update`` is required, hence
    this import-time hook rather than an environment setting.
    """
    if _os.environ.get("P360_COMPILE_CACHE", "1") != "1":
        return
    try:
        import jax
        jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("P360_CACHE_DIR",
                            _os.path.expanduser("~/.cache/jax_comp")))
        # cache everything: small programs recompile too (the pipeline
        # dispatches ~30 distinct programs, many sub-second)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:   # never let cache plumbing break imports
        pass


_enable_compile_cache()

from pano360_tpu import geometry  # noqa: F401, E402
