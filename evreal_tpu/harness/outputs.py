"""Per-frame output writers — formats byte-compatible with the reference
(utils/eval_utils.py:57-84): ``timestamps.txt`` rows ``{idx} {ts:.15f}``,
metric rows ``{idx} {score:.5f}``, frames ``frame_%010d.png`` as
``round(img*255)`` uint8."""

import os
from pathlib import Path

import cv2
import numpy as np


def ensure_dir(dirname):
    Path(dirname).mkdir(parents=True, exist_ok=True)


def append_timestamp(path, description, timestamp):
    with open(path, "a", encoding="utf-8") as f:
        f.write("{} {:.15f}\n".format(description, timestamp))


def append_result(path, description, result, is_int=False):
    fmt = "{} {}\n" if is_int else "{} {:.5f}\n"
    with open(path, "a", encoding="utf-8") as f:
        if isinstance(result, (list, tuple)):
            for idx, elem in zip(description, result):
                f.write(fmt.format(idx, elem))
        else:
            f.write(fmt.format(description, result))


def save_inferred_image(folder, image, idx):
    png_path = os.path.join(folder, "frame_{:010d}.png".format(idx))
    cv2.imwrite(png_path, np.round(image * 255).astype(np.uint8))


def truncate(path):
    open(path, "w", encoding="utf-8").close()
