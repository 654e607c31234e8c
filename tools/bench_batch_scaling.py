#!/usr/bin/env python
"""Lockstep-batch scaling of the flagship E2VID serving pipeline.

The per-method roofline (BASELINE.md) shows batch-1 inference is
latency/op-count bound (<1% MXU, <15 GB/s HBM), so the framework's
throughput axis is the lockstep sequence batch (harness/batched.py) —
this sweep measures how far that axis scales on one chip: device-resident
aggregate frames/s at ECD scale for batch n in --batches, f32 (reference
parity) and bfloat16 (serving mode).

    python -u tools/bench_batch_scaling.py [--batches 8 16 32 64]

Timing fences with a device-scalar value fetch (through the axon tunnel
``block_until_ready`` can return before execution finishes).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)
sys.path.insert(0, _REPO)

CHUNK_T = int(os.environ.get("EVREAL_CHUNK_T", "32"))  # lane HBM ∝ n×chunk
CAP = 32768
N_EVENTS = 30000
H, W = 180, 240


def make_buffers(rng, n):
    bufs = {
        "xs": rng.integers(0, W, (n, CHUNK_T, CAP)).astype(np.int16),
        "ys": rng.integers(0, H, (n, CHUNK_T, CAP)).astype(np.int16),
        "ts": np.sort(rng.uniform(0, 0.04, (n, CHUNK_T, CAP))
                      .astype(np.float32), axis=2),
        "ps": (rng.integers(0, 2, (n, CHUNK_T, CAP)) * 2 - 1)
        .astype(np.int8),
        "count": np.full((n, CHUNK_T), N_EVENTS, np.int32),
    }
    bufs["ts"] -= bufs["ts"][:, :, :1]
    return bufs


def time_runner(runner, dev_bufs, n, iters=4, reps=3):
    state = runner.init_state()
    state, imgs, _ = runner.run(state, dev_bufs)  # compile + warm
    float(imgs.sum())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, imgs, _ = runner.run(state, dev_bufs)
        float(imgs.sum())
        best = min(best, (time.perf_counter() - t0) / (iters * CHUNK_T * n))
    return 1.0 / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", nargs="+", type=int,
                    default=[8, 16, 32, 64])
    ap.add_argument("--dtypes", nargs="+",
                    default=["float32", "bfloat16"],
                    choices=["float32", "bfloat16"],
                    help="dtypes to sweep (b256 f32 exceeds HBM; "
                         "bf16-only probes the serving ceiling)")
    args = ap.parse_args()

    import jax

    from evreal_tpu.harness.batched import BatchedRunner
    from evreal_tpu.models import build_flagship_e2vid
    from evreal_tpu.utils import enable_compile_cache

    enable_compile_cache()
    model, params = build_flagship_e2vid(seed=0)
    rng = np.random.default_rng(0)

    rows = []
    for n in args.batches:
        bufs = make_buffers(rng, n)
        dev_bufs = {k: jax.device_put(v) for k, v in bufs.items()}
        jax.block_until_ready(dev_bufs)
        row = {"batch": n}
        for dtype in args.dtypes:
            os.environ["EVREAL_DTYPE"] = dtype
            try:
                runner = BatchedRunner(model, params, event_norm=True,
                                       post_norm="robust", height=H, width=W,
                                       num_bins=5, n=n, chunk_t=CHUNK_T)
                fps = time_runner(runner, dev_bufs, n)
                key = "f32_fps" if dtype == "float32" else "bf16_fps"
                row[key] = round(fps, 1)
                print(f"b{n} {dtype}: {fps:.1f} fps "
                      f"({1000.0 / fps * n:.2f} ms/frame/seq)", flush=True)
            finally:
                os.environ.pop("EVREAL_DTYPE", None)
        rows.append(row)
        del dev_bufs, bufs
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
