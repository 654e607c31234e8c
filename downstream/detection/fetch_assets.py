#!/usr/bin/env python
"""Refresh the detection task's ground-truth assets from an EVREAL checkout.

``frame_list.txt`` (the 400 frame ids of MVSEC outdoor_night1) and
``mvsec_nightl21_labels/`` (368 Pascal-VOC label files used by
pascal_voc_map.py) are human-annotation data originating in the reference
(downstream_tasks/detection/) and now ship in-tree next to this script, so
scoring runs out of the box. Use this script only to re-sync them from a
clone of https://github.com/ercanburak/EVREAL:

    python downstream/detection/fetch_assets.py /path/to/EVREAL
"""

import argparse
import os
import shutil
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("evreal_path", help="path to an EVREAL checkout")
    args = ap.parse_args()
    src = os.path.join(args.evreal_path, "downstream_tasks", "detection")
    frame_list = os.path.join(src, "frame_list.txt")
    labels = os.path.join(src, "mvsec_nightl21_labels")
    if not (os.path.exists(frame_list) and os.path.isdir(labels)):
        sys.exit(f"{src} does not contain frame_list.txt + "
                 f"mvsec_nightl21_labels/")
    shutil.copy2(frame_list, os.path.join(HERE, "frame_list.txt"))
    dst = os.path.join(HERE, "mvsec_nightl21_labels")
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    shutil.copytree(labels, dst)
    n = len(os.listdir(dst))
    print(f"copied frame_list.txt and {n} label files into {HERE}")


if __name__ == "__main__":
    main()
