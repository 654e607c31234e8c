#!/usr/bin/env python
"""Camera-calibration MAPE vs ground-truth intrinsics (reference
downstream_tasks/calibration/get_mape.py): parse kalibr result files
(calibdir_<model>/iter*/results-cam-calibreconstruction.txt), average the
(fx, fy, cx, cy, k1, k2) estimates over iterations, and report the mean
absolute percentage error against gt_calib_params.txt."""

import argparse
import glob
import os


def parse_kalibr_results(path):
    with open(path, encoding="utf-8") as f:
        lines = f.readlines()
    proj = lines[6].split("projection: [")[-1].split("] +- [")[0].split()
    fx, fy, cx, cy = (float(p) for p in proj)
    dist = lines[5].split("distortion: [")[-1].split("] +- [")[0].split()
    k1, k2 = (float(p) for p in dist[:2])
    return fx, fy, cx, cy, k1, k2


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--gt", default="gt_calib_params.txt")
    ap.add_argument("--pattern", default=os.path.join(
        "calibdir_*", "iter*", "results-cam-calibreconstruction.txt"))
    args = ap.parse_args()

    results = {}
    for path in sorted(glob.glob(args.pattern)):
        model = path.split(os.sep)[0].split("calibdir_")[-1]
        results.setdefault(model, []).append(parse_kalibr_results(path))

    with open(args.gt, encoding="utf-8") as f:
        gt = [float(p) for p in f.readline().split()[:6]]

    for model, preds in results.items():
        avg = [sum(v) / len(v) for v in zip(*preds)]
        errs = [abs(g - p) / g for g, p in zip(gt, avg)]
        print(f"{model} MAPE: {100 * sum(errs) / len(errs):.2f}%")


if __name__ == "__main__":
    main()
