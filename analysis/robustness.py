#!/usr/bin/env python
"""Robustness analysis over eval outputs (reference analyze_robustness.py).

Reads ``outputs/<condition>/<dataset>/<sequence>/<method>/<metric>.txt``
(plus ``event_rate.txt``) and produces:

  * metric vs window duration  (conditions t10ms..t100ms)
  * metric vs events-per-window (k5k..k45k)
  * metric vs ratio of discarded frames (kr0.1..kr1.0)
  * metric vs event-rate deciles (std outputs, per-frame join)

Plots are written as PNGs (headless environment) instead of plt.show();
aggregation semantics (per-condition mean over all frames of all sequences,
index-aligned join of metric/event-rate rows, 10 equal-width buckets) match
the reference.
"""

import argparse
import glob
import os
import re

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

MODEL_ORDER = ["E2VID", "FireNet", "E2VID+", "FireNet+", "SPADE-E2VID",
               "SSL-E2VID", "ET-Net", "HyperE2VID"]
MARKERS = ["o", "d", "8", "*", "v", "X", "s", "p", "P", "h", "H", "D"]


def order_models(models):
    rank = {m: i for i, m in enumerate(reversed(MODEL_ORDER))}
    return sorted(models, key=lambda m: rank.get(m, 99999))


def extract_numeric_value(s):
    match = re.search(r"\d+", s)
    if not match:
        raise ValueError(f"Cannot extract numeric value from {s}")
    return int(match.group())


def _read_rows(path):
    indices, values = [], []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.split(" ")
            indices.append(int(parts[0]))
            values.append(float(parts[-1]))
    return indices, values


def read_scores(directory, pattern="*", metric="lpips", skip_models=(),
                datasets=None):
    """{model: {condition: mean score over all frames/sequences}}.
    ``datasets``: optional dataset-name filter — without it --datasets
    applied only to the event-rate plot while the sweep plots silently
    aggregated every dataset."""
    scores = {}
    for cond_path in sorted(glob.glob(os.path.join(directory, pattern))):
        condition = os.path.basename(cond_path)
        for model_path in glob.glob(os.path.join(cond_path, "*", "*", "*")):
            if not os.path.isdir(model_path):
                continue
            if datasets is not None:
                ds = os.path.basename(os.path.dirname(
                    os.path.dirname(model_path)))
                if ds not in datasets:
                    continue
            model = os.path.basename(model_path)
            if model in skip_models:
                continue
            scores.setdefault(model, {}).setdefault(condition, [])
            metric_path = os.path.join(model_path, metric + ".txt")
            if os.path.exists(metric_path):
                scores[model][condition].extend(_read_rows(metric_path)[1])
    means = {}
    for model, conds in scores.items():
        means[model] = {c: float(np.mean(v)) for c, v in conds.items() if v}
    return means


def read_event_rate_joined(directory, metric="lpips",
                           datasets=("ECD", "MVSEC", "HQF")):
    """Per-frame (model, event_rate, score) rows, index-aligned."""
    rows = []
    for dataset in datasets:
        for model_path in glob.glob(os.path.join(directory, dataset,
                                                 "*", "*")):
            model = os.path.basename(model_path)
            mpath = os.path.join(model_path, metric + ".txt")
            epath = os.path.join(model_path, "event_rate.txt")
            if not (os.path.exists(mpath) and os.path.exists(epath)):
                continue
            mi, mv = _read_rows(mpath)
            ei, ev_ = _read_rows(epath)
            if len(mv) == len(ev_):
                pairs = zip(ev_, mv)
            else:
                md = dict(zip(mi, mv))
                ed = dict(zip(ei, ev_))
                pairs = ((ed[i], md[i]) for i in set(mi) & set(ei))
            rows.extend({"model": model, "event_rate": er, "score": sc}
                        for er, sc in pairs)
    return pd.DataFrame(rows)


def plot_condition_sweep(means, xlabel, ylabel, out_path,
                         transform=extract_numeric_value):
    plt.figure(figsize=(7, 4.5))
    # y-limits from the data (a fixed [0,1] anchor is wrong for unbounded
    # metrics like PSNR when --metric is overridden)
    lo, hi = float("inf"), float("-inf")
    any_data = False
    for idx, model in enumerate(order_models(list(means.keys()))):
        pts = sorted((transform(c), v) for c, v in means[model].items())
        if not pts:
            continue
        any_data = True
        xs, ys = zip(*pts)
        lo, hi = min(lo, min(ys)), max(hi, max(ys))
        plt.plot(xs, ys, linestyle="--", marker=MARKERS[idx % len(MARKERS)],
                 label=model)
    if not any_data:
        print(f"No data available for plotting ({out_path}).")
        plt.close()
        return
    plt.ylim(lo - 0.02, hi + 0.02)
    plt.legend(loc="upper left", bbox_to_anchor=(1, 1))
    plt.xlabel(xlabel)
    plt.ylabel(ylabel)
    plt.tight_layout()
    plt.savefig(out_path, dpi=150)
    plt.close()
    print(f"wrote {out_path}")


def plot_event_rate(df, ylabel, out_path, n_buckets=10):
    if df.empty:
        print(f"No data available for plotting ({out_path}).")
        return
    plt.figure(figsize=(7, 4.5))
    for idx, model in enumerate(order_models(list(df["model"].unique()))):
        sub = df[df["model"] == model]
        buckets = pd.cut(sub["event_rate"], n_buckets, include_lowest=True)
        grouped = sub["score"].groupby(buckets, observed=False).mean()
        mids = [b.mid for b in grouped.index.categories]
        plt.plot(mids, grouped.values, linestyle="--",
                 marker=MARKERS[idx % len(MARKERS)], label=model)
    plt.xlabel("event rate (events/sec.)")
    plt.ylabel(ylabel)
    plt.legend(loc="upper left", bbox_to_anchor=(1, 1))
    plt.ticklabel_format(axis="x", style="sci", scilimits=(6, 6))
    plt.tight_layout()
    plt.savefig(out_path, dpi=150)
    plt.close()
    print(f"wrote {out_path}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--outputs", default="outputs")
    ap.add_argument("--metric", default="lpips")
    ap.add_argument("--plot-dir", default="analysis_plots")
    ap.add_argument("--datasets", nargs="+", default=["ECD", "MVSEC", "HQF"])
    args = ap.parse_args()
    os.makedirs(args.plot_dir, exist_ok=True)
    m = args.metric
    ml = m.upper()

    plot_condition_sweep(
        read_scores(args.outputs, "t*ms", m, datasets=args.datasets),
        "duration (ms)", ml,
        os.path.join(args.plot_dir, f"{m}_vs_duration.png"))
    plot_condition_sweep(
        read_scores(args.outputs, "k*k", m, datasets=args.datasets),
        "# of events in groups [K]", ml,
        os.path.join(args.plot_dir, f"{m}_vs_events.png"))
    plot_condition_sweep(
        read_scores(args.outputs, "kr*", m, datasets=args.datasets),
        "ratio of discarded frames", ml,
        os.path.join(args.plot_dir, f"{m}_vs_keepratio.png"),
        # 'std' can only appear if the pattern is widened to include the
        # baseline dir; nothing is discarded there, so it plots at 0.0
        # (the reference's own dead branch mapped it to 1.0)
        transform=lambda x: 0.0 if x == "std" else 1 - float(x[2:]))
    plot_event_rate(
        read_event_rate_joined(os.path.join(args.outputs, "std"), m,
                               datasets=args.datasets), ml,
        os.path.join(args.plot_dir, f"{m}_vs_eventrate.png"))


if __name__ == "__main__":
    main()
