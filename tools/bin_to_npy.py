#!/usr/bin/env python
"""Convert N-Caltech101/N-MNIST binary spike files to the npy memmap format.

Format (per the public ATIS spec, as in the reference tools/bin_to_npy.py):
5 bytes/event — x, y, [p:1bit | ts:23 bits big-endian]; rows with y == 240
are 13-bit timer-overflow markers adding 2^13 us to all later timestamps."""

import argparse
import glob
import os

import numpy as np


def bin_to_npy(bin_path, output_path):
    raw = np.fromfile(bin_path, dtype=np.uint8).astype(np.uint32)
    all_x = raw[0::5]
    all_y = raw[1::5]
    all_p = (raw[2::5] & 128) >> 7
    all_ts = ((raw[2::5] & 127) << 16) | (raw[3::5] << 8) | raw[4::5]

    # timer overflow rows (y == 240): add 2^13 us to everything after
    overflow = np.where(all_y == 240)[0]
    for i in overflow:
        all_ts[i:] += 2 ** 13

    keep = all_y != 240
    np.save(os.path.join(output_path, "events_ts.npy"),
            all_ts[keep].astype(np.float64) / 1e6)
    np.save(os.path.join(output_path, "events_xy.npy"),
            np.stack([all_x[keep], all_y[keep]], -1).astype(np.int16))
    np.save(os.path.join(output_path, "events_p.npy"),
            all_p[keep].astype(bool))


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("path", help="dataset root with <class>/<instance>.bin")
    ap.add_argument("--remove", action="store_true")
    args = ap.parse_args()
    for path in sorted(glob.glob(os.path.join(args.path, "*", "*.bin"))):
        print(f"Processing {path}")
        out = os.path.splitext(path)[0]
        os.makedirs(out, exist_ok=True)
        bin_to_npy(path, out)
        if args.remove:
            os.remove(path)
    print("Done.")
