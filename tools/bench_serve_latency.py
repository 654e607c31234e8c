#!/usr/bin/env python
"""Steady-state serve-mode latency table (VERDICT r03 item 8).

Per method: in-process ReconEngine (serve.py, chunk_t=1 — the latency
configuration), one stream at ECD scale, N windows of ~30k synthetic
events pushed one at a time, wall-clock per ``push`` (upload one packed
window -> dispatch -> download one frame). Reports p50 / p90 / p99 /
mean ms per window plus the chip-state probes bracketing the capture, so
the table is interpretable under this chip's drifting dispatch-latency
axis (BASELINE.md "chip-state caveat": batch-1 numbers are only
comparable within a bracketed capture).

    python -u tools/bench_serve_latency.py                 # all 8 methods
    python -u tools/bench_serve_latency.py -m FireNet E2VID --windows 64
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)
sys.path.insert(0, _REPO)

ALL_METHODS = ["FireNet", "FireNet+", "E2VID", "E2VID+", "SSL-E2VID",
               "SPADE-E2VID", "HyperE2VID", "ET-Net"]
H, W = 180, 240
N_EVENTS = 30000


def make_window(rng):
    xs = rng.integers(0, W, N_EVENTS).astype(np.int16)
    ys = rng.integers(0, H, N_EVENTS).astype(np.int16)
    ts = np.sort(rng.uniform(0.0, 0.04, N_EVENTS))
    ps = rng.integers(0, 2, N_EVENTS).astype(np.uint8)
    return xs, ys, ts, ps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--methods", nargs="+", default=ALL_METHODS)
    ap.add_argument("--windows", type=int, default=96)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--probes", action="store_true", default=True)
    ap.add_argument("--group", type=int, default=0,
                    help="also measure the lockstep-group throughput mode "
                         "(open_group(N)/push_group — one batched dispatch "
                         "advances N synchronized streams): per-tick wall "
                         "-> per-stream latency + aggregate fps. Unlike "
                         "the single-stream rows this mode is largely "
                         "insensitive to the chip's dispatch-latency axis "
                         "(BASELINE.md roofline note)")
    args = ap.parse_args()

    from bench import op_latency_probe

    from evreal_tpu.serve import ReconEngine
    from evreal_tpu.utils import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)
    windows = [make_window(rng) for _ in range(8)]

    probe_before = op_latency_probe()
    print(f"op-latency probe before: {probe_before:.1f} us/iter",
          flush=True)

    rows = []
    for method in args.methods:
        try:
            engine = ReconEngine.from_method(method)
            sid = engine.open_stream(H, W)
            lat = []
            for i in range(args.warmup + args.windows):
                xs, ys, ts, ps = windows[i % len(windows)]
                t0 = time.perf_counter()
                engine.push(sid, xs, ys, ts, ps)
                dt = time.perf_counter() - t0
                if i >= args.warmup:
                    lat.append(dt * 1e3)
            engine.close(sid)
            lat = np.asarray(lat)
            row = {"method": method,
                   "p50_ms": round(float(np.percentile(lat, 50)), 2),
                   "p90_ms": round(float(np.percentile(lat, 90)), 2),
                   "p99_ms": round(float(np.percentile(lat, 99)), 2),
                   "mean_ms": round(float(lat.mean()), 2),
                   "windows": int(lat.size)}
        except Exception as exc:  # noqa: BLE001 — report and continue
            row = {"method": method, "error": str(exc)[:200]}
        rows.append(row)
        print(json.dumps(row), flush=True)

        if args.group and "error" not in row:
            try:
                gid = engine.open_group(args.group, H, W)
                glat = []
                for i in range(args.warmup + args.windows):
                    w8 = [windows[(i + j) % len(windows)]
                          for j in range(args.group)]
                    t0 = time.perf_counter()
                    engine.push_group(gid, w8)
                    dt = time.perf_counter() - t0
                    if i >= args.warmup:
                        glat.append(dt * 1e3)
                engine.close_group(gid)
                glat = np.asarray(glat)
                p50 = float(np.percentile(glat, 50))
                grow = {"method": method, "group_n": args.group,
                        "tick_p50_ms": round(p50, 2),
                        "tick_p99_ms": round(
                            float(np.percentile(glat, 99)), 2),
                        "aggregate_fps": round(args.group / (p50 / 1e3), 1),
                        "windows": int(glat.size)}
            except Exception as exc:  # noqa: BLE001
                grow = {"method": method, "group_n": args.group,
                        "error": str(exc)[:200]}
            rows.append(grow)
            print(json.dumps(grow), flush=True)

    probe_after = op_latency_probe()
    print(f"op-latency probe after: {probe_after:.1f} us/iter", flush=True)
    from bench import host_load_probe

    # host state too: dispatch shares the single host core, and the r05
    # capture showed the op-latency probe alone decorrelating 20-50x from
    # measured serve latency across two same-probe-reading days
    print(json.dumps({"rows": rows,
                      "probe_op_latency_us_before": round(probe_before, 1),
                      "probe_op_latency_us_after": round(probe_after, 1),
                      **host_load_probe()}))


if __name__ == "__main__":
    main()
