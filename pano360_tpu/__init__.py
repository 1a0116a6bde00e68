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

from pano360_tpu import geometry  # noqa: F401
