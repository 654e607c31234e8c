#!/usr/bin/env python
"""Reorganize N-Caltech101 reconstructions by model/class for the
classification downstream task (reference tools/organize_NCaltech101_recons.py:
picks frame_0000000002.png per instance from outputs/<cfg>/NCaltech101)."""

import argparse
import glob
import os
import shutil


def main(cfg="t60ms_s", frame="frame_0000000002.png"):
    pattern = os.path.join("outputs", cfg, "NCaltech101", "*", "*")
    for folder in sorted(glob.glob(pattern)):
        folder = os.path.normpath(folder)
        src = os.path.join(folder, frame)
        if not os.path.isfile(src):
            print("Could not find image at " + src)
            continue
        parts = folder.split(os.sep)
        model_name, class_and_instance = parts[-1], parts[-2]
        class_name, instance = class_and_instance.split("_image_")
        dst_dir = os.path.join("outputs", "NCaltech101", model_name,
                               class_name)
        os.makedirs(dst_dir, exist_ok=True)
        shutil.copy2(src, os.path.join(dst_dir, instance + ".png"))


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="t60ms_s")
    ap.add_argument("--frame", default="frame_0000000002.png")
    args = ap.parse_args()
    main(args.config, args.frame)
