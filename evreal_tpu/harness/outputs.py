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


def save_inferred_image(folder, image, idx):
    png_path = os.path.join(folder, "frame_{:010d}.png".format(idx))
    # uint8 input is already round(clip(img)*255) — the eval loops quantize
    # on device so only a quarter of the bytes cross the device->host link
    # (runner.quantize_u8, bit-identical to this host path by test)
    arr = (image if image.dtype == np.uint8
           else np.round(image * 255).astype(np.uint8))
    ok = cv2.imwrite(png_path, arr)
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
        self._n_failed = 0
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
                if self._err is None:  # keep the first error
                    self._err = e
                self._n_failed += 1

    def submit(self, folder, image, idx):
        if self._err is not None:
            # fail on the NEXT frame, not after the whole sequence: with a
            # broken output path (disk full, permissions) the run would
            # otherwise burn its entire device compute before close()
            # finally raised
            raise OSError(f"{self._n_failed} image write(s) failed; "
                          f"first error: {self._err}") from self._err
        self._q.put((folder, image, idx))

    def close(self):
        self._q.put(None)
        self._t.join()
        if self._err is not None:
            raise OSError(f"{self._n_failed} image write(s) failed; "
                          f"first error: {self._err}") from self._err


def truncate(path):
    open(path, "w", encoding="utf-8").close()
