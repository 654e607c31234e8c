#!/usr/bin/env python
"""Bracketed A/B of the fused voxelize-into-scan chunk program.

Legs (each its own BatchedRunner / compiled program, same process):

  * ``fused``      — EVREAL_FUSED=1 equivalent: one scan whose step
                     voxelizes its own window (harness/runner.py FUSED)
  * ``unfused``    — the r03 two-stage program (voxel stage vmapped over
                     all lanes x chunk_t windows, then the model scan)
  * ``pallas``     — fused with EVREAL_VOXELIZE=pallas (the whole-chunk
                     kernel's window grid maps over the N lanes per step)
  * ``s2d``        — fused with EVREAL_S2D=64: the full-res 64->32 k5
                     decoder conv (the one soft kernel in the per-kernel
                     cost table) lowered as a space-to-depth k3 packed conv
  * ``upfuse``     — fused with EVREAL_UPFUSE=1: the decoders' 2x bilinear
                     upsample folded into the k5 conv (one composed conv on
                     the pre-upsample grid, resize kernels eliminated)

Interleaved reps (fused/unfused/fused/... within one process, deltas per
rep) so chip-state drift cancels — the op-latency axis drifts 6x on
~tens-of-minutes timescales (BASELINE.md), so only bracketed same-process
A/Bs are trustworthy. Timing fences with a device-scalar value fetch.

    python -u tools/bench_fused_ab.py --batch 128 --dtype bfloat16
    python -u tools/bench_fused_ab.py --batch 16 --dtype float32 \
        --legs fused unfused pallas
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)
sys.path.insert(0, _REPO)

CAP = 32768
N_EVENTS = 30000
H, W = 180, 240


def make_buffers(rng, n, chunk_t):
    bufs = {
        "xs": rng.integers(0, W, (n, chunk_t, CAP)).astype(np.int16),
        "ys": rng.integers(0, H, (n, chunk_t, CAP)).astype(np.int16),
        "ts": np.sort(rng.uniform(0, 0.04, (n, chunk_t, CAP))
                      .astype(np.float32), axis=2),
        "ps": (rng.integers(0, 2, (n, chunk_t, CAP)) * 2 - 1)
        .astype(np.int8),
        "count": np.full((n, chunk_t), N_EVENTS, np.int32),
    }
    bufs["ts"] -= bufs["ts"][:, :, :1]
    return bufs


def build_leg(leg, model, params, n, chunk_t, dtype, dev_bufs):
    """Build AND compile+warm under this leg's env — jax.jit traces at the
    first call, not at _build(), so trace-time env reads (EVREAL_S2D) must
    still see the leg's settings during the warm run."""
    import jax

    from evreal_tpu.harness import runner as runner_mod
    from evreal_tpu.harness.batched import BatchedRunner

    os.environ["EVREAL_DTYPE"] = dtype
    if leg == "pallas":
        os.environ["EVREAL_VOXELIZE"] = "pallas"
    else:
        os.environ.pop("EVREAL_VOXELIZE", None)
    if leg == "s2d":
        os.environ["EVREAL_S2D"] = "64"
    else:
        os.environ.pop("EVREAL_S2D", None)
    if leg == "upfuse":
        os.environ["EVREAL_UPFUSE"] = "1"
    else:
        os.environ.pop("EVREAL_UPFUSE", None)
    runner_mod.FUSED = leg != "unfused"
    try:
        r = BatchedRunner(model, params, event_norm=True,
                          post_norm="robust", height=H, width=W,
                          num_bins=5, n=n, chunk_t=chunk_t)
        r._fn = r._build()  # trace under this leg's FUSED setting
        st = r.init_state()
        st, imgs, _ = r.run(st, dev_bufs)  # compile + warm, env still set
        jax.block_until_ready(imgs)
        return r, st, np.asarray(imgs)
    finally:
        os.environ.pop("EVREAL_DTYPE", None)
        os.environ.pop("EVREAL_VOXELIZE", None)
        os.environ.pop("EVREAL_S2D", None)
        os.environ.pop("EVREAL_UPFUSE", None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--chunk-t", type=int,
                    default=int(os.environ.get("EVREAL_CHUNK_T", "32")))
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--legs", nargs="+", default=["fused", "unfused"],
                    choices=["fused", "unfused", "pallas", "s2d", "upfuse"])
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax

    from evreal_tpu.models import build_flagship_e2vid
    from evreal_tpu.utils import enable_compile_cache

    enable_compile_cache()
    model, params = build_flagship_e2vid(seed=0)
    rng = np.random.default_rng(0)
    n, chunk_t = args.batch, args.chunk_t
    bufs = make_buffers(rng, n, chunk_t)
    dev_bufs = {k: jax.device_put(v) for k, v in bufs.items()}
    jax.block_until_ready(dev_bufs)

    runners = {}
    outs = {}
    for leg in args.legs:
        t0 = time.perf_counter()
        r, st, imgs = build_leg(leg, model, params, n, chunk_t, args.dtype,
                                dev_bufs)
        print(f"{leg}: compiled+warm in {time.perf_counter() - t0:.1f}s",
              flush=True)
        runners[leg] = (r, st)
        outs[leg] = imgs

    ref_leg = args.legs[0]
    for leg in args.legs[1:]:
        d = float(np.max(np.abs(outs[leg] - outs[ref_leg])))
        print(f"max|{leg} - {ref_leg}| = {d:.2e}", flush=True)

    frames = args.iters * chunk_t * n
    times = {leg: [] for leg in args.legs}
    for rep in range(args.reps):
        for leg in args.legs:  # interleaved: drift cancels in the deltas
            r, st = runners[leg]
            t0 = time.perf_counter()
            for _ in range(args.iters):
                st, imgs, _ = r.run(st, dev_bufs)
            float(imgs.sum())
            dt = (time.perf_counter() - t0) / frames
            runners[leg] = (r, st)
            times[leg].append(dt)
            print(f"rep{rep} {leg}: {dt * 1e3:.3f} ms/frame "
                  f"({1.0 / dt:.1f} fps)", flush=True)

    summary = {"batch": n, "chunk_t": chunk_t, "dtype": args.dtype}
    for leg in args.legs:
        best = min(times[leg])
        med = sorted(times[leg])[len(times[leg]) // 2]
        summary[leg] = {"best_ms_frame": round(best * 1e3, 3),
                        "median_ms_frame": round(med * 1e3, 3),
                        "best_fps": round(1.0 / best, 1)}
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
