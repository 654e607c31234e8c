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
    ok = cv2.imwrite(png_path, np.round(image * 255).astype(np.uint8))
    if not ok:  # cv2 fails silently (returns False) on unwritable paths
        raise OSError(f"failed to write {png_path}")


class AsyncImageWriter:
    """Background PNG writer. cv2.imwrite releases the GIL, so encoding
    overlaps the main thread's device waits — on this 1-core host PNG
    saving (~0.4 ms/frame at ECD size) would otherwise serialize with the
    eval loop. The queue is bounded so a slow disk backpressures instead of
    ballooning memory; ``close()`` drains and re-raises any write error."""

    def __init__(self, maxsize=128):
        import queue
        import threading

        self._q = queue.Queue(maxsize)
        self._err = None
        self._t = threading.Thread(target=self._loop, daemon=True)
        self._t.start()

    def _loop(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            folder, image, idx = item
            try:
                save_inferred_image(folder, image, idx)
            except Exception as e:  # noqa: BLE001 — surfaced in close()
                self._err = e

    def submit(self, folder, image, idx):
        self._q.put((folder, image, idx))

    def close(self):
        self._q.put(None)
        self._t.join()
        if self._err is not None:
            raise self._err


def truncate(path):
    open(path, "w", encoding="utf-8").close()
