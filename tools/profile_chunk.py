#!/usr/bin/env python
"""Per-kernel cost table of the lockstep chunk program (VERDICT r03 item 2).

Runs the batched E2VID serving pipeline steady-state under a
``jax.profiler`` trace, then parses the xplane proto directly (no
TensorBoard UI on this host) and prints per-kernel self-time aggregated
over the trace window: kernel name, total ms, % of device time, and a
coarse category (conv / matmul-voxel / layout / elementwise / reduce /
loop bookkeeping). This is the TPU analogue of the reference's CudaTimer
table (utils/timers.py:28-37) at kernel granularity, with the device
plane as ground truth.

    python -u tools/profile_chunk.py --batch 128 --dtype bfloat16
    python -u tools/profile_chunk.py --trace-only /tmp/trace  # reparse

The trace directory is kept (--dir) so a capture can be re-analyzed.
"""

import argparse
import glob
import json
import os
import re
import sys
import time
from collections import defaultdict

import numpy as np

_REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)
sys.path.insert(0, _REPO)


def _load_xplane_pb2():
    for mod in ("xprof.protobuf.xplane_pb2",
                "tensorboard_plugin_profile.protobuf.xplane_pb2",
                "tensorflow.tsl.profiler.protobuf.xplane_pb2",
                "tensorflow.core.profiler.protobuf.xplane_pb2"):
        try:
            import importlib

            return importlib.import_module(mod)
        except Exception:  # noqa: BLE001 — try the next provider
            continue
    raise ImportError("no xplane_pb2 provider available")


def parse_trace(trace_dir):
    """{kernel name: SELF duration ps} from the device plane(s) of every
    xplane.pb under trace_dir.

    Events on a device line nest (a ``while`` op's span contains its body
    fusions; the ``jit_fn`` module span contains everything), so raw
    duration sums double-count. Within each line, events are treated as
    an interval forest by containment and each event is charged only its
    *self* time (duration minus directly-contained children) — parents
    like ``jit_fn``/``while`` then show only loop/dispatch bookkeeping,
    leaves show their real cost."""
    xplane_pb2 = _load_xplane_pb2()
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    totals = defaultdict(int)
    occurrences = defaultdict(int)
    meta = {}  # kernel -> {source, flops, bytes} from HLO metadata
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            name = plane.name.lower()
            # device planes: "/device:TPU:0" / "TPU:0" etc.; the CPU
            # backend (smoke test) exposes "/host:CPU" with XLA op lines
            if "tpu" not in name and "gpu" not in name \
                    and "cpu" not in name:
                continue
            if "host threads" in name and "tpu" not in name:
                continue
            ev_meta = plane.event_metadata
            for line in plane.lines:
                lname = line.name.lower()
                # XLA op activity lines; skip python/infeed bookkeeping
                if "step" in lname or "python" in lname:
                    continue
                sm = plane.stat_metadata
                evs = []
                for ev in line.events:
                    md = ev_meta.get(ev.metadata_id)
                    if md is None:
                        continue
                    key = md.display_name or md.name
                    evs.append((ev.offset_ps, ev.offset_ps + ev.duration_ps,
                                key))
                    if key not in meta:
                        info = {}
                        for st in md.stats:
                            sname = (sm[st.metadata_id].name
                                     if st.metadata_id in sm else "")
                            if sname == "source":
                                info["source"] = st.str_value
                            elif sname == "flops":
                                info["flops"] = st.int64_value \
                                    or st.uint64_value
                            elif sname == "raw_bytes_accessed":
                                info["bytes"] = st.int64_value \
                                    or st.uint64_value
                        if info:
                            meta[key] = info
                # self time via a containment stack: sorted by (start,
                # -end), an event's direct children are exactly the later
                # events it contains; each child's full span is charged to
                # its immediate parent, so self = span - direct children
                evs.sort(key=lambda t: (t[0], -t[1]))
                stack = []  # [end, key, start, direct_child_span]
                for start, end, key in evs:
                    while stack and stack[-1][0] <= start:
                        e, k, s, ch = stack.pop()
                        totals[k] += max(0, (e - s) - ch)
                    if stack and end > stack[-1][0]:
                        end = stack[-1][0]  # clip malformed overlap
                    if stack:
                        stack[-1][3] += end - start
                    stack.append([end, key, start, 0])
                    occurrences[key] += 1
                while stack:
                    e, k, s, ch = stack.pop()
                    totals[k] += max(0, (e - s) - ch)
    return totals, occurrences, meta


_CATEGORIES = (
    ("conv", re.compile(r"convolution|conv_general", re.I)),
    ("matmul", re.compile(r"^dot|dot_general|fusion.*dot", re.I)),
    ("scan/loop", re.compile(r"while|condition|body|tuple", re.I)),
    ("copy/layout", re.compile(r"copy|transpose|bitcast|reshape|concat|"
                               r"slice|pad|reverse|gather|scatter", re.I)),
    ("reduce", re.compile(r"reduce|sort|top-k|topk", re.I)),
    ("elementwise", re.compile(r"fusion|add|multiply|divide|convert|"
                               r"tanh|exp|select|compare|maximum", re.I)),
)


def categorize(name):
    for cat, rx in _CATEGORIES:
        if rx.search(name):
            return cat
    return "other"


def report(totals, occurrences, meta=None, top=30):
    """Per-kernel SELF-time table with HLO-metadata utilization columns:
    achieved TFLOP/s and GB/s per kernel (flops/bytes are per occurrence
    in the metadata, so rates use total_time/n)."""
    meta = meta or {}
    total_ns = sum(totals.values())
    if total_ns == 0:
        print("empty trace")
        return {}
    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    print(f"{'kernel':42s} {'ms':>9s} {'%':>6s} {'n':>6s} "
          f"{'TF/s':>6s} {'GB/s':>6s} source")
    by_cat = defaultdict(int)
    for name, ns in rows:
        by_cat[categorize(name)] += ns
    for name, ns in rows[:top]:
        info = meta.get(name, {})
        per_occ_s = ns / 1e12 / max(1, occurrences[name])
        tf = info.get("flops", 0) / per_occ_s / 1e12 if per_occ_s else 0
        gb = info.get("bytes", 0) / per_occ_s / 1e9 if per_occ_s else 0
        src = info.get("source", "")
        src = src.rsplit("evreal_tpu/", 1)[-1]
        print(f"{name[:42]:42s} {ns / 1e9:9.3f} "
              f"{100.0 * ns / total_ns:6.2f} {occurrences[name]:6d} "
              f"{tf:6.1f} {gb:6.0f} {src}")
    print("\nby category:")
    cats = {}
    for cat, ns in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        pct = 100.0 * ns / total_ns
        print(f"  {cat:14s} {ns / 1e9:10.3f} ms  {pct:5.1f}%")
        cats[cat] = round(pct, 2)
    return cats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--chunk-t", type=int,
                    default=int(os.environ.get("EVREAL_CHUNK_T", "32")))
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--iters", type=int, default=2,
                    help="steady-state chunks inside the trace window")
    ap.add_argument("--dir", default="/tmp/evreal_trace")
    ap.add_argument("--trace-only", default=None,
                    help="existing trace dir to (re)parse; skips the run")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    if args.trace_only:
        totals, occ, meta = parse_trace(args.trace_only)
        cats = report(totals, occ, meta, args.top)
        print(json.dumps({"by_category_pct": cats}))
        return

    import jax

    from evreal_tpu.harness.batched import BatchedRunner
    from evreal_tpu.models import build_flagship_e2vid
    from evreal_tpu.utils import enable_compile_cache
    from tools.bench_fused_ab import make_buffers

    enable_compile_cache()
    os.environ["EVREAL_DTYPE"] = args.dtype
    model, params = build_flagship_e2vid(seed=0)
    rng = np.random.default_rng(0)
    bufs = make_buffers(rng, args.batch, args.chunk_t)
    dev_bufs = {k: jax.device_put(v) for k, v in bufs.items()}
    jax.block_until_ready(dev_bufs)

    runner = BatchedRunner(model, params, event_norm=True,
                           post_norm="robust", height=180, width=240,
                           num_bins=5, n=args.batch, chunk_t=args.chunk_t)
    state = runner.init_state()
    state, imgs, _ = runner.run(state, dev_bufs)  # compile + warm
    float(imgs.sum())

    t0 = time.perf_counter()
    with jax.profiler.trace(args.dir):
        for _ in range(args.iters):
            state, imgs, _ = runner.run(state, dev_bufs)
        float(imgs.sum())
    wall = time.perf_counter() - t0
    frames = args.iters * args.chunk_t * args.batch
    print(f"traced {args.iters} chunks ({frames} frames) in {wall:.2f}s "
          f"({wall / frames * 1e3:.3f} ms/frame) -> {args.dir}", flush=True)

    totals, occ, meta = parse_trace(args.dir)
    cats = report(totals, occ, meta, args.top)
    print(json.dumps({"by_category_pct": cats,
                      "wall_ms_frame": round(wall / frames * 1e3, 3),
                      "batch": args.batch, "dtype": args.dtype,
                      "fused": runner.fused}))


if __name__ == "__main__":
    main()
