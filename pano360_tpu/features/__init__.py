"""Feature detectors/descriptors (SIFT, MSOP) and keypoint utilities."""

from pano360_tpu.features.sift import (  # noqa: F401
    SiftConfig, SiftFeatures, sift_extract,
)
