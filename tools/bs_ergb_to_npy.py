#!/usr/bin/env python
"""Convert a BS-ERGB sequence (events/*.npz + images/*.png + timestamp.txt)
to the npy memmap format. Reference semantics (tools/bs_ergb_to_npy.py):
1/32-subpixel coordinates rounded to pixels with 16-bit overflow repair,
microsecond->second timestamps zeroed at the first frame, grayscale frames."""

import argparse
import glob
import os
import shutil

import cv2
import numpy as np

FRAME_WIDTH = 970
FRAME_HEIGHT = 625


def fix_subpixel_coords(data, upper_limit):
    data = data.astype(np.int32)
    overflow = data > upper_limit * 32
    data[overflow] -= 65536
    data = np.rint(data / 32.0).astype(np.int16)
    return np.clip(data, 0, upper_limit)


def bs_ergb_to_npy(input_path, output_path):
    image_paths = sorted(glob.glob(os.path.join(input_path, "images",
                                                "*.png")))
    event_paths = sorted(glob.glob(os.path.join(input_path, "events",
                                                "*.npz")))
    assert len(image_paths) == len(event_paths) + 1
    os.makedirs(output_path)

    with open(os.path.join(input_path, "images", "timestamp.txt"),
              encoding="utf-8") as f:
        ts_us = [float(line) for line in f]
    start_s = ts_us[0] / 1e6
    images_ts = (np.array(ts_us) / 1e6 - start_s).reshape(-1, 1)
    np.save(os.path.join(output_path, "images_ts.npy"), images_ts)

    counts = []
    xs, ys, ts, ps = [], [], [], []
    for path in event_paths:
        d = np.load(path)
        counts.append(d["x"].shape[0])
        xs.append(fix_subpixel_coords(d["x"], FRAME_WIDTH - 1))
        ys.append(fix_subpixel_coords(d["y"], FRAME_HEIGHT - 1))
        ts.append(d["timestamp"].astype(np.float64) / 1e6 - start_s)
        ps.append(d["polarity"].astype(np.uint8))

    indices = np.concatenate([[0], np.cumsum(counts)]).reshape(-1, 1)
    np.save(os.path.join(output_path, "image_event_indices.npy"),
            indices.astype(np.int64))
    np.save(os.path.join(output_path, "events_ts.npy"), np.concatenate(ts))
    np.save(os.path.join(output_path, "events_xy.npy"),
            np.stack([np.concatenate(xs), np.concatenate(ys)], -1))
    np.save(os.path.join(output_path, "events_p.npy"), np.concatenate(ps))

    imgs = np.stack([cv2.imread(p, cv2.IMREAD_GRAYSCALE)[..., None]
                     for p in image_paths])
    np.save(os.path.join(output_path, "images.npy"), imgs)


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("path", help="sequence folder with events/ and images/")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--overwrite", action="store_true")
    args = ap.parse_args()
    seq = os.path.basename(os.path.normpath(args.path))
    out = os.path.join(args.output_dir, seq)
    if os.path.exists(out):
        if not args.overwrite:
            raise SystemExit(f"Output directory {out} already exists")
        shutil.rmtree(out)
    bs_ergb_to_npy(args.path, out)
