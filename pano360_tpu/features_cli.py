"""Standalone feature extraction + matching CLI (features.py:303-321 parity).

Extracts and matches at half resolution, writing ``matches_{name}.npz`` in
the reference's exact cache format.
"""
from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from pano360_tpu.cli import load_images
from pano360_tpu.pipeline import matching


def main(argv=None):
    parser = argparse.ArgumentParser(description="Extract features.")
    parser.add_argument("--path", type=str, default="../data/ppwwyyxx/CMU2",
                        help="directory with the images to process.")
    parser.add_argument("--detector", default="sift",
                        choices=["sift", "msop"])
    args = parser.parse_args(argv)

    name = os.path.basename(args.path)
    imgs = load_images(args.path, shrink=2)   # half resolution
    kpts, matches = matching(imgs, detector=args.detector)
    np.savez(f"matches_{name}.npz", kpts=kpts, matches=matches)
    print(f"saved matches_{name}.npz")


if __name__ == "__main__":
    logging.basicConfig(level=logging.DEBUG)
    logging.getLogger("jax").setLevel(logging.WARNING)
    main()
