#!/usr/bin/env python
"""Convert event .txt files (E2VID-HDR format: first line 'W H', then rows
't x y p') to the npy memmap format. Reference semantics
(tools/txt_to_npy.py): zero-based f64 timestamps, int16 xy, bool polarity,
optional xy flip, metadata.json with sensor resolution. Event-only (no
frames)."""

import argparse
import glob
import json
import os

import numpy as np


def txt_to_npy(input_path, output_path, flip=False):
    with open(input_path, encoding="utf-8") as f:
        width, height = (int(v) for v in f.readline().split())
    data = np.loadtxt(input_path, dtype=np.float64, skiprows=1)
    ts = data[:, 0] - data[:, 0].min()
    xy = data[:, 1:3].copy()
    if flip:
        xy[:, 0] = width - 1 - xy[:, 0]
        xy[:, 1] = height - 1 - xy[:, 1]
    np.save(os.path.join(output_path, "events_ts.npy"), ts.astype(np.float64))
    np.save(os.path.join(output_path, "events_xy.npy"), xy.astype(np.int16))
    np.save(os.path.join(output_path, "events_p.npy"),
            data[:, 3].astype(bool))
    with open(os.path.join(output_path, "metadata.json"), "w",
              encoding="utf-8") as f:
        json.dump({"sensor_resolution": [height, width]}, f)


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("path", help="directory of event txt files")
    ap.add_argument("--flip", action="store_true")
    ap.add_argument("--remove", action="store_true")
    args = ap.parse_args()
    for path in sorted(glob.glob(os.path.join(args.path, "*.txt"))):
        print(f"Processing {path}")
        out = os.path.splitext(path)[0]
        os.makedirs(out, exist_ok=True)
        txt_to_npy(path, out, flip=args.flip)
        if args.remove:
            os.remove(path)
