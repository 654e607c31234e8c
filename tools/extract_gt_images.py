#!/usr/bin/env python
"""Dump images.npy frames as PNGs (ground truth for downstream tasks).
Reference: tools/extract_gt_images.py."""

import os
import sys

import cv2
import numpy as np


def extract_gt_images(input_dir, output_dir):
    images = np.load(os.path.join(input_dir, "images.npy"))
    os.makedirs(output_dir, exist_ok=True)
    for idx, image in enumerate(images):
        cv2.imwrite(os.path.join(output_dir,
                                 "frame_{:010d}.png".format(idx)),
                    np.squeeze(image))


if __name__ == "__main__":
    extract_gt_images(sys.argv[1], sys.argv[2])
