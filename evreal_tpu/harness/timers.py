"""Per-method device timing (reference utils/timers.py UX: per-name samples,
mean printed at process exit). Wall time around a block whose results are
``block_until_ready``-synchronized by the caller."""

import atexit
import time
from collections import defaultdict

import numpy as np

device_timers = defaultdict(list)


class DeviceTimer:
    def __init__(self, timer_name="", frames=1):
        self.timer_name = timer_name
        self.frames = max(frames, 1)

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *args):
        elapsed_ms = (time.perf_counter() - self.start) * 1000.0
        # record per-frame cost so the summary matches the reference's
        # per-forward numbers
        device_timers[self.timer_name].append(elapsed_ms / self.frames)


def print_timing_info():
    if not device_timers:
        return
    print("== Timing statistics ==")
    for name, values in device_timers.items():
        print(f"{name}: {np.mean(np.array(values)):.2f} ms/frame "
              f"({len(values)} samples)")


atexit.register(print_timing_info)
