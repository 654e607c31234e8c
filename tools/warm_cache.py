#!/usr/bin/env python
"""Pre-warm the persistent XLA compile cache with the standard program set.

Remote compiles on this backend run 1-40 min each and are wildly
program-shape-dependent (BASELINE.md sweep table: t60ms spent 2436 s wall
almost entirely in 5 compiles), so a cold cache makes the first CLI run of
a sweep pathological. This tool AOT-compiles (``jit(fn).lower(...).
compile()`` — no execution, no data) exactly the programs the real CLI
would build for a named (methods x eval-configs x dataset) matrix, plus
``--bench`` for bench.py's serving programs, sequentially with per-program
wall + cache-population progress. Warming is naturally resumable: already
cached programs compile in seconds, so rerunning after an interruption
skips ahead.

The signature replication mirrors the CLI prologue precisely
(runner.eval_method_with_config / batched.eval_method_on_sequence_group):
same same-resolution grouping + EVREAL_BATCH_N split, same mesh-aware
``n_pad``, same ``plan_capacity`` buckets over the gated windows, same wire
dtypes, same chunk_t — anything env-dependent (EVREAL_WIRE, EVREAL_FUSED,
EVREAL_SCAN_UNROLL, EVREAL_DTYPE, EVREAL_UPFUSE) is inherited from the
calling environment exactly as the CLI inherits it, so warm with the same
env you will run with.

    python -u tools/warm_cache.py -m E2VID FireNet+ -c std t60ms -d SYN_SWEEP
    python -u tools/warm_cache.py --bench          # bench.py's programs

Reference counterpart: none (torch eager recompiles nothing) — this is a
TPU-native cost the framework owns (VERDICT r04 item 5).
"""

import argparse
import glob
import json
import os
import sys
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.abspath(os.path.join(_TOOLS, os.pardir))
sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402


def cache_dir():
    return os.environ.get("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/evreal_jax"))


def cache_population():
    d = cache_dir()
    return len(glob.glob(os.path.join(d, "*"))) if os.path.isdir(d) else 0


def _sds_tree(tree):
    import jax

    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(tuple(x.shape), x.dtype), tree)


def _bufs_sds(shape_prefix, capacity, dtypes):
    """ShapeDtypeStructs via the same builder the CLI allocates with, so a
    wire-format key change cannot desynchronize the warmed signature."""
    import jax

    from evreal_tpu.data.packing import alloc_buffers

    return alloc_buffers(shape_prefix, capacity, dtypes,
                         alloc=lambda s, d: jax.ShapeDtypeStruct(tuple(s),
                                                                 d))


def _compile_one(label, sig_key, runner, bufs_sds, seen, results):
    """AOT-compile one runner program at one buffer signature (dedup'd:
    sweep families share capacity buckets by design, so most conditions
    resolve to an already-warmed program). The signature must carry
    everything that changes the compiled program: resolution and num_bins
    are NOT recoverable from the buffer shapes (compact wires are
    resolution-independent), so same-capacity groups at different sensor
    resolutions are distinct programs."""
    state = runner.init_state()  # tiny dispatch; shapes are what we need
    sig = (sig_key, type(runner).__name__, runner.chunk_t,
           (runner.h, runner.w), runner.num_bins,
           tuple(sorted((k, str(v.dtype), tuple(v.shape))
                        for k, v in bufs_sds.items())))
    if sig in seen:
        return
    seen.add(sig)
    import jax

    c0, t0 = cache_population(), time.perf_counter()
    fn = runner._build()
    fn.lower(_sds_tree(runner._params_cast), _sds_tree(state),
             bufs_sds).compile()
    wall = time.perf_counter() - t0
    new = cache_population() - c0
    results.append({"program": label, "compile_s": round(wall, 1),
                    "new_cache_entries": new})
    print(f"  {label}: {wall:.1f}s, {new} new cache entries", flush=True)


def warm_cli(methods, config_names, dataset_names, seen, results):
    from evreal_tpu.data.packing import wire_dtypes, wire_format
    from evreal_tpu.harness import runner as R
    from evreal_tpu.harness.batched import get_eval_mesh
    from evreal_tpu.harness.config import (
        get_dataset_configs,
        get_eval_configs,
        get_method_config,
    )

    eval_configs = get_eval_configs(config_names)
    dataset_configs = get_dataset_configs(dataset_names)
    # one bundle per method across ALL configs (params load once), and one
    # dataset assembly per eval config (memmap opens + window tables are
    # host work on a 1-core machine) — the same hoisting the CLI does
    bundles = {m: R.MethodBundle(m, get_method_config(m)) for m in methods}
    for eval_config in eval_configs:
        if eval_config.get("color", False):
            # the CLI routes color configs through ColorRunner
            # (eval_method_with_config batched_ok gate); not warmed here
            print(f"  skipping {eval_config['name']}: color configs use "
                  f"the ColorRunner path, not warmed by this tool",
                  flush=True)
            continue
        datasets = R.get_datasets(dataset_configs,
                                  eval_config.get("dataset_kwargs", {}))
        eval_infer_all = eval_config.get("eval_infer_all", False)
        # replicate the CLI's batched gate exactly (runner.py
        # eval_method_with_config): EVREAL_BATCHED=0 means per-sequence
        # MethodRunner programs, not lockstep groups
        batched_ok = os.environ.get("EVREAL_BATCHED", "1") != "0"
        for method_name in methods:
            method_config = get_method_config(method_name)
            bundle = bundles[method_name]
            for dataset in datasets:
                # same-resolution grouping, exactly as
                # eval_method_with_config does
                from collections import OrderedDict

                if batched_ok:
                    by_res = OrderedDict()
                    for sequence in dataset["sequences"]:
                        k = tuple(sequence["dataset"].sensor_resolution)
                        by_res.setdefault(k, []).append(sequence)
                    groups = R.split_groups(list(by_res.values()),
                                            R.DEFAULT_BATCH_N)
                else:
                    groups = [[s] for s in dataset["sequences"]]
                for group in groups:
                    seqs = [s["dataset"] for s in group]
                    resolution = seqs[0].sensor_resolution
                    procs, metas_all = [], []
                    for s, seq in zip(group, seqs):
                        metas = seq.windows()
                        procs.append(R.gate_windows(
                            metas, s["start_time_s"], s["end_time_s"],
                            eval_infer_all))
                        metas_all.append(metas)
                    from evreal_tpu.data import plan_capacity

                    capacity = plan_capacity(
                        metas_all[k][i]["event_count"]
                        for k in range(len(seqs)) for i in procs[k])
                    int_coords = all(np.issubdtype(s.xy.dtype, np.integer)
                                     for s in seqs)
                    dtypes = wire_dtypes(wire_format(), int_coords,
                                         resolution)
                    n = len(group)
                    if n > 1:
                        mesh = get_eval_mesh()
                        n_pad = n
                        if mesh is not None:
                            dp = mesh.shape["dp"]
                            n_pad = -(-n // dp) * dp
                        runner = bundle.batched_runner_for(
                            resolution, method_config, seqs[0].num_bins,
                            n_pad)
                        prefix = (n_pad, runner.chunk_t)
                    else:
                        runner = bundle.runner_for(
                            resolution, method_config, seqs[0].num_bins)
                        prefix = (runner.chunk_t,)
                    label = (f"{method_name} @ {eval_config['name']}/"
                             f"{dataset['name']} n={n} cap={capacity} "
                             f"res={resolution}")
                    _compile_one(label, method_name, runner,
                                 _bufs_sds(prefix, capacity, dtypes),
                                 seen, results)


def warm_bench(seen, results):
    """bench.py's serving programs: lockstep b16 chunk_t=32 @ ECD scale on
    the compact4 wire (headline) + the f32 wire (diag leg), in f32 and the
    bf16 serving mode, with bench's own opt-ins (scan unroll 4, upfuse).

    The opt-ins are bench-only: every mutated setting is restored on exit
    so a combined `--bench -d ...` invocation does not warm the CLI matrix
    at the wrong cache keys (the CLI runs unroll=1/upfuse=0 defaults —
    and single-seq FireNet+ at unroll=4 is the known XLA-stall shape,
    CLAUDE.md); main() additionally orders warm_cli() first."""
    from evreal_tpu.harness import runner as runner_mod

    prev_upfuse = os.environ.get("EVREAL_UPFUSE")
    prev_dtype = os.environ.get("EVREAL_DTYPE")
    prev_unroll = runner_mod.SCAN_UNROLL
    os.environ.setdefault("EVREAL_UPFUSE", "1")
    runner_mod.SCAN_UNROLL = int(os.environ.get("EVREAL_SCAN_UNROLL", "4"))
    from evreal_tpu.harness.batched import BatchedRunner
    from evreal_tpu.models import build_flagship_e2vid

    model, params = build_flagship_e2vid(seed=0)
    b = int(os.environ.get("EVREAL_BENCH_B", "16"))
    t = int(os.environ.get("EVREAL_BENCH_T", "32"))
    h = int(os.environ.get("EVREAL_BENCH_H", "180"))
    w = int(os.environ.get("EVREAL_BENCH_W", "240"))
    cap = int(os.environ.get("EVREAL_BENCH_CAP", "32768"))
    compact = _bufs_sds((b, t), cap, {"ev": np.uint32, "count": np.int32})
    f32 = _bufs_sds((b, t), cap, {"xs": np.int16, "ys": np.int16,
                                  "ts": np.float32, "ps": np.int8,
                                  "count": np.int32})
    try:
        for dtype in (None, "bfloat16"):
            if dtype:
                os.environ["EVREAL_DTYPE"] = dtype
            else:
                os.environ.pop("EVREAL_DTYPE", None)
            runner = BatchedRunner(model, params, event_norm=True,
                                   post_norm="robust", height=h, width=w,
                                   num_bins=5, n=b, chunk_t=t)
            wires = [("compact4", compact)] + ([("f32", f32)]
                                              if dtype is None else [])
            for wire_name, bufs in wires:
                _compile_one(f"bench b{b} t{t} {dtype or 'f32'} "
                             f"{wire_name}-wire",
                             f"bench-{dtype or 'f32'}", runner, bufs,
                             seen, results)
    finally:
        runner_mod.SCAN_UNROLL = prev_unroll
        for key, prev in (("EVREAL_DTYPE", prev_dtype),
                          ("EVREAL_UPFUSE", prev_upfuse)):
            if prev is None:
                os.environ.pop(key, None)
            else:
                os.environ[key] = prev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--methods", nargs="+",
                    default=["E2VID", "FireNet", "E2VID+", "FireNet+",
                             "SPADE-E2VID", "SSL-E2VID", "ET-Net",
                             "HyperE2VID"])
    ap.add_argument("-c", "--configs", nargs="+", default=["std"])
    ap.add_argument("-d", "--datasets", nargs="+", default=None,
                    help="dataset config names (required unless --bench)")
    ap.add_argument("--bench", action="store_true",
                    help="warm bench.py's serving programs instead of (or "
                         "in addition to) a CLI matrix")
    args = ap.parse_args()
    if not args.bench and not args.datasets:
        ap.error("either --bench or -d <dataset> is required")

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir())
    from evreal_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax

    # tiny programs (CPU smoke tests) fall under the 2 s write threshold;
    # the env override lets tests observe cache writes
    try:
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(os.environ.get("EVREAL_CACHE_MIN_COMPILE_S", "2.0")))
    except Exception:  # noqa: BLE001 — cache remains best-effort
        pass

    seen, results = set(), []
    t0 = time.perf_counter()
    # CLI matrix first: warm_bench temporarily flips bench-only settings
    # (unroll/upfuse/dtype) and must not influence the CLI signatures
    if args.datasets:
        warm_cli(args.methods, args.configs, args.datasets, seen, results)
    if args.bench:
        warm_bench(seen, results)
    print(json.dumps({"programs": results,
                      "total_wall_s": round(time.perf_counter() - t0, 1),
                      "cache_dir": cache_dir(),
                      "cache_population": cache_population()}))


if __name__ == "__main__":
    main()
