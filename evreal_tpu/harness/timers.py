"""Per-method timing (reference utils/timers.py UX: per-name samples, summary
printed at process exit).

Semantics differ from the reference's CudaTimer deliberately: the pipeline
here is async (chunks are dispatched ahead of host-side file writing), so a
bare per-forward device time is not observable without serializing it away.
What is recorded instead is steady-state pipeline wall-clock per frame — the
honest serving metric: callers time the whole per-sequence loop and call
``exclude_warmup`` once the first chunk (which bears jit compilation) has
completed, so compile time is excluded.  The exit summary is **frame-count
weighted** across sequences (a 10-frame sequence does not get the same say
as a 5000-frame one).
"""

import atexit
import time
from collections import defaultdict

device_timers = defaultdict(list)  # name -> [(elapsed_ms, frames), ...]


class DeviceTimer:
    def __init__(self, timer_name="", frames=1):
        self.timer_name = timer_name
        self.frames = max(frames, 1)

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def exclude_warmup(self, frames_done):
        """Restart the clock after the first, compile-bearing chunk; the
        caller must have synchronized that chunk's outputs. ``frames_done``
        frames drop out of the sample."""
        self.start = time.perf_counter()
        self.frames -= frames_done

    def __exit__(self, *args):
        elapsed_ms = (time.perf_counter() - self.start) * 1000.0
        if self.frames > 0:
            device_timers[self.timer_name].append((elapsed_ms, self.frames))


def print_timing_info():
    if not device_timers:
        return
    print("== Timing statistics ==")
    for name, samples in device_timers.items():
        total_ms = sum(e for e, _ in samples)
        total_frames = sum(f for _, f in samples)
        print(f"{name}: {total_ms / max(total_frames, 1):.2f} ms/frame "
              f"({total_frames} frames, {len(samples)} sequences)")


atexit.register(print_timing_info)
