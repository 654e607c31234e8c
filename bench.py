#!/usr/bin/env python
"""Headline benchmark: E2VID-architecture reconstruction throughput at ECD
scale (180x240, 30k events/window) — full pipeline (voxelize -> input-norm ->
pad -> scan model -> crop -> robust post-norm) on the available accelerator,
steady state, in the production-serving configuration: 16 independent
sequences evaluated in lockstep as one scanned batch (the reference can only
process sequences serially; batching is this framework's TPU scaling axis,
harness/batched.py). Reported fps is aggregate frames/second of wall-clock.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference PyTorch pipeline (CPU voxelize + torch forward)
measured on this machine's host CPU = 3.17 frames/s (see BASELINE.md; the
reference's own GPU numbers are not published in its repo). Note: the chip
behind the axon tunnel has been observed throttled to ~11% of peak for
hours at a time (BASELINE.md "Measured"), which depresses this number
proportionally.
"""

import json
import time

import numpy as np

REF_BASELINE_FPS = 3.17  # reference torch pipeline, this host (BASELINE.md)
BATCH_N = 16
CHUNK_T = 32


def main():
    import os

    import jax

    from evreal_tpu.harness.batched import BatchedRunner
    from evreal_tpu.models import build_flagship_e2vid
    from evreal_tpu.utils import enable_compile_cache

    # persistent compilation cache: first compile of this program has been
    # observed taking minutes when the chip is degraded; later runs (incl.
    # the driver's) reuse the cached executable
    enable_compile_cache()

    h, w, n_events = 180, 240, 30000
    model, params = build_flagship_e2vid(seed=0)

    runner = BatchedRunner(model, params, event_norm=True,
                           post_norm="robust", height=h, width=w,
                           num_bins=5, n=BATCH_N, chunk_t=CHUNK_T)

    rng = np.random.default_rng(0)
    cap = 32768
    # compact packed dtypes, as emitted by data/packing.py
    buffers = {
        "xs": rng.integers(0, w, (BATCH_N, CHUNK_T, cap)).astype(np.int16),
        "ys": rng.integers(0, h, (BATCH_N, CHUNK_T, cap)).astype(np.int16),
        "ts": np.sort(rng.uniform(0, 0.04, (BATCH_N, CHUNK_T, cap))
                      .astype(np.float32), axis=2),
        "ps": (rng.integers(0, 2, (BATCH_N, CHUNK_T, cap)) * 2 - 1)
        .astype(np.int8),
        "count": np.full((BATCH_N, CHUNK_T), n_events, np.int32),
    }
    buffers["ts"] -= buffers["ts"][:, :, :1]

    state = runner.init_state()
    # warmup / compile (incl. the scalar-fence reduction)
    state, imgs, _ = runner.run(state, buffers)
    float(imgs.sum())

    # steady state: async-chained chunks (the eval loop's pipelined pattern),
    # best of 3 to shed axon-tunnel scheduling noise. The fence is a device
    # scalar fetch: through the axon tunnel block_until_ready has been
    # observed returning before execution finishes, a value fetch has not.
    iters = 4
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, imgs, _ = runner.run(state, buffers)
        float(imgs.sum())
        best = min(best,
                   (time.perf_counter() - t0) / (iters * CHUNK_T * BATCH_N))

    fps = 1.0 / best
    print(json.dumps({
        "metric": "e2vid_recon_fps_ecd_b16",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REF_BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
