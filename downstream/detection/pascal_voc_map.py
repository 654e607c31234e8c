#!/usr/bin/env python
"""Pascal-VOC mAP scoring of car detections on reconstructed frames
(reference downstream_tasks/detection/pascal_voc_map.py): greedy IoU matching
at 0.5, interpolated AP, per-file AP averaged (NaN -> 0).

Label/prediction format per frame file: GT rows ``class xmin ymin xmax ymax``;
prediction rows ``class conf xmin ymin xmax ymax``.
"""

import argparse
import math
import os

import numpy as np

MODELS = ["E2VID", "FireNet", "E2VID+", "FireNet+", "SPADE-E2VID",
          "SSL-E2VID", "ET-Net", "HyperE2VID", "groundtruth"]


def iou(a, b):
    x0, y0 = max(a[0], b[0]), max(a[1], b[1])
    x1, y1 = min(a[2], b[2]), min(a[3], b[3])
    if x1 < x0 or y1 < y0:
        return 0.0
    inter = (x1 - x0) * (y1 - y0)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / float(area_a + area_b - inter)


def interpolated_ap(precision, recall):
    p = np.concatenate([[0.0], precision, [0.0]])
    r = np.concatenate([[0.0], recall, [1.0]])
    for i in range(len(p) - 2, -1, -1):
        p[i] = max(p[i], p[i + 1])
    return float(np.sum((r[1:] - r[:-1]) * p[1:]))


def voc_ap(gt_boxes, pred_boxes, iou_thresh=0.5):
    """gt_boxes: [(cls, box)], pred_boxes: [(cls, conf, box)]."""
    gt = list(gt_boxes)
    preds = sorted(pred_boxes, key=lambda x: -x[1])
    num_gt = len(gt)
    assert num_gt > 0
    tp = np.zeros(len(preds))
    fp = np.zeros(len(preds))
    for i, (cls, _, box) in enumerate(preds):
        best, best_j = -np.inf, -1
        for j, (gcls, gbox) in enumerate(gt):
            if gcls != cls:
                continue
            v = iou(box, gbox)
            if v > best:
                best, best_j = v, j
        if best >= iou_thresh:
            tp[i] = 1
            del gt[best_j]
        else:
            fp[i] = 1
    ctp, cfp = np.cumsum(tp), np.cumsum(fp)
    recall = ctp / num_gt
    precision = ctp / np.maximum(ctp + cfp, 1e-12)
    return interpolated_ap(precision, recall)


def _parse_gt(line):
    cls, rest = line.split(maxsplit=1)
    return cls, [float(v) for v in rest.split()]


def _parse_pred(line):
    cls, rest = line.split(maxsplit=1)
    vals = [float(v) for v in rest.split()]
    return cls, vals[0], vals[1:5]


def calculate_map(gt_path, pred_path):
    aps = []
    for name in os.listdir(gt_path):
        with open(os.path.join(gt_path, name), encoding="utf-8") as f:
            gts = [_parse_gt(l.strip()) for l in f if l.strip()]
        pred_file = os.path.join(pred_path, name)
        preds = []
        if os.path.exists(pred_file):
            with open(pred_file, encoding="utf-8") as f:
                preds = [_parse_pred(l.strip()) for l in f if l.strip()]
        ap = voc_ap(gts, preds)
        aps.append(0.0 if math.isnan(ap) else ap)
    return float(np.mean(aps))


SHIPPED_LABELS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "mvsec_nightl21_labels")

if __name__ == "__main__":
    ap_ = argparse.ArgumentParser(description=__doc__)
    ap_.add_argument("--labels",
                     default=("mvsec_nightl21_labels"
                              if os.path.isdir("mvsec_nightl21_labels")
                              else SHIPPED_LABELS),
                     help="directory of GT label files (defaults to the "
                          "annotations shipped next to this script)")
    ap_.add_argument("--outputs", default="outputs",
                     help="base dir with <model>/boxes/ prediction files")
    ap_.add_argument("--models", nargs="+", default=MODELS)
    args = ap_.parse_args()
    for model in args.models:
        pred = os.path.join(args.outputs, model, "boxes")
        if not os.path.isdir(pred):
            print(f"skipping {model}: {pred} not found")
            continue
        score = calculate_map(args.labels, pred) * 100
        print(f"Mean Average Precision (MAP) for {model}: {score:.2f}")
