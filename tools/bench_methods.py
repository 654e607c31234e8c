#!/usr/bin/env python
"""Per-method on-chip inference timing — the counterpart of the reference's
CudaTimer table (utils/timers.py:28-37): mean ms/frame per method at ECD
scale (180x240, 30k events/window, chunk of 32 windows).

Models are built at the published sizes: FireNet and FireNet+ use the real
shipped checkpoints (/root/reference/pretrained); the other six use
random-weight checkpoints in their authentic schemas (weights don't change
the FLOP count). Run on the machine with the TPU attached:

    python -u tools/bench_methods.py [--methods E2VID ET-Net ...]

Timing uses a device-scalar fetch as the synchronization point; through the
axon tunnel ``block_until_ready`` can return before execution finishes, so a
value fetch is the only trustworthy fence.
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

_REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)
sys.path.insert(0, os.path.join(_REPO, "tests"))
sys.path.insert(0, _REPO)

from evreal_tpu.models import flagship_e2vid_kwargs  # noqa: E402

REAL_KW = {
    # E2VID family at published size (SURVEY §2c; eval.py:134-139 spells the
    # SSL-E2VID variant out explicitly, E2VID+ matches). final_activation is
    # not a torch-ctor kwarg here — the reference forces it at load time.
    "e2vid": {k: v for k, v in flagship_e2vid_kwargs().items()
              if k != "final_activation"},
}


def make_full_size_checkpoints(root, methods):
    """Authentic-schema checkpoints at published sizes (random weights)."""
    import torch

    from oracle import ref_module
    from evreal_tpu.convert.torch_ckpt import _install_parse_config_shim

    torch.manual_seed(0)
    mm = ref_module("model.model")
    spade = ref_module("model.spade_e2v")
    eitr = ref_module("model.eitr.eitr")

    def config_parser(arch_type, args):
        shim = _install_parse_config_shim()
        cp = shim.ConfigParser()
        cp._config = {"arch": {"type": arch_type, "args": args}}
        return cp

    paths = {}

    def save(method, obj):
        d = os.path.join(root, "pretrained", method)
        os.makedirs(d, exist_ok=True)
        paths[method] = os.path.join(d, "model.pth")
        torch.save(obj, paths[method])

    kw = REAL_KW["e2vid"]
    if "E2VID" in methods:
        m = mm.E2VIDRecurrent(dict(kw))
        save("E2VID", {"model": dict(kw), "state_dict": m.state_dict()})
    if "E2VID+" in methods:
        m = mm.E2VIDRecurrent(dict(kw))
        save("E2VID+", {"config": config_parser(
            "E2VIDRecurrent", {"unet_kwargs": dict(kw)}),
            "state_dict": m.state_dict()})
    if "SSL-E2VID" in methods:
        save("SSL-E2VID", mm.E2VIDRecurrent(dict(kw)).state_dict())
    if "HyperE2VID" in methods:
        hkw = dict(kw, use_dynamic_decoder=True,
                   recurrent_block_type="convgru")
        m = mm.E2VIDRecurrent(dict(hkw))
        save("HyperE2VID", {"config": config_parser(
            "E2VIDRecurrent", {"unet_kwargs": dict(hkw)}),
            "state_dict": m.state_dict()})
    if "ET-Net" in methods:
        m = eitr.EITR({"num_bins": 5, "norm": None})
        save("ET-Net", {"config": config_parser(
            "EITR", {"eitr_kwargs": {"num_bins": 5, "norm": None}}),
            "state_dict": m.state_dict()})
    if "SPADE-E2VID" in methods:
        save("SPADE-E2VID", spade.Unet6().state_dict())
    # FireNet / FireNet+: real shipped weights from an EVREAL checkout
    evreal_root = os.environ.get("EVREAL_REFERENCE", "/root/reference")
    for method in ("FireNet", "FireNet+"):
        if method in methods:
            src = os.path.join(evreal_root, "pretrained", method,
                               "model.pth")
            if os.path.exists(src):
                paths[method] = src
    return paths


def bench_method(method, ckpt_path, h=180, w=240, n_events=30000,
                 chunk_t=32, iters=8, repeats=3, flops_only=False):
    import jax

    from evreal_tpu.convert import load_method_checkpoint, nest
    from evreal_tpu.harness.config import get_method_config
    from evreal_tpu.harness.runner import MethodRunner
    from evreal_tpu.models import build_from_meta

    flat, meta = load_method_checkpoint(method, ckpt_path)
    model = build_from_meta(meta)
    mc = get_method_config(method)
    runner = MethodRunner(
        model, nest(flat),
        event_norm=mc.get("event_tensor_normalization", False),
        post_norm=mc.get("post_process_norm", "none"),
        height=h, width=w, num_bins=5, chunk_t=chunk_t)

    rng = np.random.default_rng(0)
    cap = 32768
    buffers = {
        "xs": rng.integers(0, w, (chunk_t, cap)).astype(np.int16),
        "ys": rng.integers(0, h, (chunk_t, cap)).astype(np.int16),
        "ts": np.sort(rng.uniform(0, 0.04, (chunk_t, cap))
                      .astype(np.float32), axis=1),
        "ps": (rng.integers(0, 2, (chunk_t, cap)) * 2 - 1).astype(np.int8),
        "count": np.full((chunk_t,), n_events, np.int32),
    }
    buffers["ts"] -= buffers["ts"][:, :1]

    state = runner.init_state()
    if flops_only:
        # cost accounting runs entirely on the CPU backend (loop-aware
        # composition, runner.cost_analysis) — no chip required
        flops_chunk, bytes_chunk = runner.cost_analysis(state, buffers)
        return (flops_chunk / chunk_t if flops_chunk else None,
                bytes_chunk / chunk_t if bytes_chunk else None)
    state, imgs, clipped = runner.run(state, buffers)
    float(clipped.sum())  # compile + fence

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, imgs, clipped = runner.run(state, buffers)
        float(clipped.sum())  # value fetch = trustworthy fence
        best = min(best, (time.perf_counter() - t0) / (iters * chunk_t))

    from evreal_tpu.utils.mfu import mfu

    flops_chunk, bytes_chunk = runner.cost_analysis(state, buffers)
    tflops = frac = gbps = None
    if flops_chunk:
        tflops, frac = mfu(flops_chunk, best * chunk_t)
    if bytes_chunk:
        gbps = bytes_chunk / (best * chunk_t) / 1e9
    return best * 1e3, tflops, frac, gbps


ALL = ["E2VID", "E2VID+", "FireNet", "FireNet+", "SPADE-E2VID",
       "SSL-E2VID", "ET-Net", "HyperE2VID"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--methods", nargs="+", default=ALL)
    ap.add_argument("--isolate", action="store_true",
                    help="run each method in its own subprocess: a long "
                    "multi-method process accumulates tunnel/backend state "
                    "and later methods measure up to 3x slower (SPADE-E2VID "
                    "96 ms mid-sweep vs 29 ms alone, same chip, 2026-08-17)")
    ap.add_argument("--flops-only", action="store_true",
                    help="print per-frame GFLOP / modeled HBM GB per method "
                    "(loop-aware cost accounting, CPU backend, no chip)")
    args = ap.parse_args()
    if args.flops_only:
        import jax

        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        with tempfile.TemporaryDirectory() as root:
            paths = make_full_size_checkpoints(root, args.methods)
            results = {}
            for method in args.methods:
                if method not in paths:
                    print(f"{method}: no checkpoint available", flush=True)
                    continue
                fl, by = bench_method(method, paths[method], flops_only=True)
                results[method] = {
                    "gflop_per_frame": round(fl / 1e9, 3) if fl else None,
                    "modeled_gb_per_frame":
                        round(by / 1e9, 4) if by else None}
                print(f"{method}: {results[method]}", flush=True)
            print(json.dumps(results))
        return
    if args.isolate and len(args.methods) > 1:
        import subprocess

        merged = {}
        for method in args.methods:
            proc = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__),
                 "--methods", method],
                capture_output=True, text=True)
            out = [ln for ln in proc.stdout.splitlines() if ln.strip()]
            print("\n".join(ln for ln in out if not ln.startswith("{")),
                  flush=True)
            if proc.returncode == 0 and out and out[-1].startswith("{"):
                merged.update(json.loads(out[-1]))
            else:
                print(f"{method}: subprocess failed (rc={proc.returncode})",
                      flush=True)
        print(json.dumps(merged))
        return
    import jax

    from evreal_tpu.utils import enable_compile_cache

    enable_compile_cache()  # shared persistent compile cache (see bench.py)

    print(f"backend: {jax.default_backend()}", flush=True)
    # batch-1 latency scales almost linearly with the small-op dispatch
    # axis (bench.py op_latency_probe), which drifts within minutes and is
    # invisible to the MXU/HBM probes — stamp it so any recorded table is
    # interpretable (BASELINE.md "third independent axis")
    if jax.default_backend() == "tpu":
        sys.path.insert(0, _REPO)
        from bench import HEALTHY_OP_LATENCY_US, op_latency_probe

        op_us = op_latency_probe()
        print(f"probe_op_latency_us: {op_us:.1f} "
              f"(healthy ~{HEALTHY_OP_LATENCY_US:.0f})", flush=True)
    else:
        op_us = None
    with tempfile.TemporaryDirectory() as root:
        paths = make_full_size_checkpoints(root, args.methods)
        results = {}
        if op_us is not None:
            results["probe_op_latency_us"] = round(op_us, 1)
        for method in args.methods:
            if method not in paths:
                print(f"{method}: no checkpoint available", flush=True)
                continue
            ms, tflops, frac, gbps = bench_method(method, paths[method])
            results[method] = {"ms_per_frame": round(ms, 3)}
            extra = ""
            if tflops is not None:
                results[method]["tflops_per_s"] = round(tflops, 2)
                extra = f", {tflops:.2f} TFLOP/s"
                if frac is not None:
                    results[method]["mfu_vs_bf16_peak"] = round(frac, 4)
                    extra += f" = {100 * frac:.2f}% MXU peak"
            if gbps is not None:
                results[method]["hbm_gbps"] = round(gbps, 1)
                extra += f", {gbps:.0f} GB/s HBM"
            print(f"{method}: {ms:.2f} ms/frame ({1000.0 / ms:.0f} fps"
                  f"{extra})", flush=True)
        print(json.dumps(results))


if __name__ == "__main__":
    main()
