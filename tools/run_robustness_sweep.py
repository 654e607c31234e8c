#!/usr/bin/env python
"""Run a full robustness sweep end-to-end on the real chip and feed the
robustness analyzer from the real output tree (reference README.md:109-115,
analyze_robustness.py:229-234).

Provisions everything that is environment-blocked from download:

  1. two ECD-scale (180x240) synthetic sequences under data/SYN_SWEEP/
     (tools/make_synthetic_sequence.py scene), ~600 kev/s so the t-sweep's
     window populations span 6k..60k events;
  2. config/dataset/SYN_SWEEP.json (same schema as the shipped SYN config);
  3. authentic-schema random-weight checkpoints at published sizes for the
     six methods without shipped weights (tools/bench_methods.py), the real
     FireNet/FireNet+ checkpoints where present;

then runs the REAL CLI once per sweep condition —

    python eval.py -m <8 methods> -c t10ms..t100ms -d SYN_SWEEP -qm mse ssim

— records wall-clock and compile-cache population per condition, and runs
``analysis/robustness.py --metric mse`` over the resulting output tree, so
the many-configs x many-methods loop (compile-cache reuse across 10
configs, 4 capacity buckets) is proven at production shape.

    python -u tools/run_robustness_sweep.py                 # full sweep
    python -u tools/run_robustness_sweep.py --family k      # k5k..k45k
    python -u tools/run_robustness_sweep.py --methods FireNet+ E2VID
"""

import argparse
import glob
import json
import os
import subprocess
import sys
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.abspath(os.path.join(_TOOLS, os.pardir))
sys.path.insert(0, _REPO)
sys.path.insert(0, _TOOLS)

ALL_METHODS = ["E2VID", "FireNet", "E2VID+", "FireNet+", "SPADE-E2VID",
               "SSL-E2VID", "ET-Net", "HyperE2VID"]
T_CONDITIONS = [f"t{t}ms" for t in range(10, 101, 10)]
K_CONDITIONS = [f"k{k}k" for k in range(5, 46, 5)]
KR_CONDITIONS = [f"kr{r / 10:.1f}" for r in range(1, 11)]
FAMILIES = {"t": T_CONDITIONS, "k": K_CONDITIONS, "kr": KR_CONDITIONS}


def provision_dataset(n_seqs=2, height=180, width=240, duration=3.0,
                      fps=25, events_per_frame=24000):
    from make_synthetic_sequence import make_sequence

    root = os.path.join(_REPO, "data", "SYN_SWEEP")
    seqs = {}
    for i in range(n_seqs):
        seq = f"seq{i}"
        d = os.path.join(root, seq)
        if not os.path.exists(os.path.join(d, "metadata.json")):
            make_sequence(d, height=height, width=width,
                          duration_s=duration, fps=fps,
                          events_per_frame=events_per_frame, seed=100 + i)
            print(f"synthesized {d}", flush=True)
        seqs[seq] = {}
    cfg = os.path.join(_REPO, "config", "dataset", "SYN_SWEEP.json")
    want = {"name": "SYN_SWEEP", "root_path": "data/SYN_SWEEP",
            "sequences": seqs}
    if not os.path.exists(cfg):
        with open(cfg, "w", encoding="utf-8") as f:
            json.dump(want, f)
            f.write("\n")
        print(f"wrote {cfg}", flush=True)
    else:  # a checked-in config must not drift from what we'd generate
        with open(cfg, encoding="utf-8") as f:
            have = json.load(f)
        if have != want:
            raise SystemExit(f"{cfg} does not match what provision_dataset "
                             f"would write; delete it to regenerate")


def provision_checkpoints(methods):
    import shutil

    from bench_methods import make_full_size_checkpoints

    missing = [m for m in methods if not os.path.exists(
        os.path.join(_REPO, "pretrained", m, "model.pth"))]
    # FireNet/FireNet+ ship real weights with the reference (the quickstart
    # copy in README.md); everything else is authentic-schema random weights
    for m in list(missing):
        src = os.path.join("/root/reference/pretrained", m, "model.pth")
        if os.path.exists(src):
            dst = os.path.join(_REPO, "pretrained", m, "model.pth")
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copyfile(src, dst)
            print(f"copied shipped checkpoint for {m}", flush=True)
            missing.remove(m)
    if missing:
        print(f"synthesizing checkpoints: {missing}", flush=True)
        make_full_size_checkpoints(_REPO, missing)


def cache_population():
    d = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.cache/evreal_jax"))
    return len(glob.glob(os.path.join(d, "*"))) if os.path.isdir(d) else 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=sorted(FAMILIES), default="t")
    ap.add_argument("--methods", nargs="+", default=ALL_METHODS)
    ap.add_argument("--timeout", type=int, default=3600,
                    help="per-condition CLI timeout (s)")
    ap.add_argument("--skip-analysis", action="store_true")
    ap.add_argument("--conditions", nargs="+", default=None,
                    help="resume subset (e.g. t60ms t70ms); default = all")
    args = ap.parse_args()
    conditions = FAMILIES[args.family]
    if args.conditions:
        bad = [c for c in args.conditions if c not in conditions]
        if bad:
            ap.error(f"--conditions {' '.join(bad)}: not in the "
                     f"--family {args.family} sweep; allowed: "
                     f"{' '.join(conditions)}")
        conditions = args.conditions

    provision_dataset()
    provision_checkpoints(args.methods)

    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/evreal_jax"))

    results = []
    t_start = time.time()
    for cond in conditions:
        c0 = cache_population()
        t0 = time.time()
        cmd = [sys.executable, "-u", os.path.join(_REPO, "eval.py"),
               "-m", *args.methods, "-c", cond, "-d", "SYN_SWEEP",
               "-qm", "mse", "ssim"]
        r = subprocess.run(cmd, cwd=_REPO, env=env, timeout=args.timeout,
                           capture_output=True, text=True)
        dt = time.time() - t0
        new_compiles = cache_population() - c0
        ok = r.returncode == 0
        results.append({"condition": cond, "wall_s": round(dt, 1),
                        "new_cache_entries": new_compiles, "ok": ok})
        print(f"{cond}: {dt:.1f}s, {new_compiles} new cache entries, "
              f"ok={ok}", flush=True)
        if not ok:
            print(r.stdout[-3000:], file=sys.stderr)
            print(r.stderr[-3000:], file=sys.stderr)

    total = time.time() - t_start
    summary = {"family": args.family, "methods": args.methods,
               "conditions": results, "total_wall_s": round(total, 1),
               "total_new_cache_entries": sum(
                   r["new_cache_entries"] for r in results)}

    if not args.skip_analysis:
        cmd = [sys.executable, os.path.join(_REPO, "analysis",
                                            "robustness.py"),
               "--metric", "mse", "--datasets", "SYN_SWEEP",
               "--outputs", os.path.join(_REPO, "outputs")]
        r = subprocess.run(cmd, cwd=_REPO, capture_output=True, text=True,
                           timeout=600)
        print(r.stdout[-2000:], flush=True)
        summary["analysis_ok"] = r.returncode == 0
        if r.returncode != 0:
            print(r.stderr[-2000:], file=sys.stderr)

    print(json.dumps(summary))


if __name__ == "__main__":
    main()
