"""Sequence/dataset assembly, config resolution, timers, and the robustness
analyzer's file readers (reference eval.py:28-99, timers.py,
analyze_robustness.py)."""

import json
import os

import numpy as np
import pytest

from evreal_tpu.harness.config import (
    get_dataset_configs,
    get_eval_configs,
    get_method_config,
)
from evreal_tpu.harness.runner import get_sequences
from evreal_tpu.harness.timers import DeviceTimer, device_timers


def _write_seq(root, name, n=400, res=(24, 32)):
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(abs(hash(name)) % 2**32)
    ts = np.sort(rng.uniform(0, 1.0, n)).astype(np.float64)
    np.save(os.path.join(d, "events_ts.npy"), ts)
    np.save(os.path.join(d, "events_xy.npy"), np.stack(
        [rng.integers(0, res[1], n), rng.integers(0, res[0], n)],
        axis=1).astype(np.int16))
    np.save(os.path.join(d, "events_p.npy"),
            rng.integers(0, 2, n).astype(np.uint8))
    with open(os.path.join(d, "metadata.json"), "w", encoding="utf-8") as f:
        json.dump({"sensor_resolution": list(res)}, f)
    return d


KW = {"num_bins": 5,
      "voxel_method": {"method": "k_events", "k": 100,
                       "sliding_window_w": 0}}


def test_get_sequences_explicit_and_time_bounds(tmp_path):
    root = str(tmp_path)
    _write_seq(root, "a")
    cfg = {"root_path": root,
           "sequences": {"a": {"start_time_s": 0.25, "end_time_s": 0.5}}}
    seqs = get_sequences(cfg, KW)
    assert [s["name"] for s in seqs] == ["a"]
    assert seqs[0]["start_time_s"] == 0.25 and seqs[0]["end_time_s"] == 0.5
    # defaults come from the data when the config gives no bounds
    cfg = {"root_path": root, "sequences": {"a": {}}}
    s = get_sequences(cfg, KW)[0]
    assert 0.0 <= s["start_time_s"] < s["end_time_s"] <= 1.0


def test_get_sequences_get_all_and_subfolders(tmp_path):
    root = str(tmp_path)
    _write_seq(root, "b")
    _write_seq(root, "a")
    names = [s["name"] for s in get_sequences(
        {"root_path": root, "get_all_sequences": True}, KW)]
    assert names == ["a", "b"]  # sorted glob

    sub = str(tmp_path / "classes")
    _write_seq(sub, os.path.join("cat", "inst01"))
    _write_seq(sub, os.path.join("dog", "inst02"))
    names = [s["name"] for s in get_sequences(
        {"root_path": sub, "get_all_sequences": True,
         "has_subfolders": True}, KW)]
    assert names == ["cat_inst01", "dog_inst02"]


def test_dataset_kwargs_precedence(tmp_path):
    """dataset-config dataset_kwargs override eval-config ones
    (reference eval.py:49)."""
    root = str(tmp_path)
    _write_seq(root, "a")
    cfg = {"root_path": root, "sequences": {"a": {}},
           "dataset_kwargs": {"num_bins": 7}}
    seq = get_sequences(cfg, KW)[0]["dataset"]
    assert seq.num_bins == 7


def test_config_resolution_cwd_first(tmp_path, monkeypatch):
    std = get_eval_configs(["std"])[0]
    assert std["name"] == "std" and std["ts_tol_ms"] == 1.0
    assert get_method_config("E2VID")["event_tensor_normalization"]
    ds = get_dataset_configs(["ECD"])[0]
    assert "sequences" in ds

    local = tmp_path / "config" / "eval"
    local.mkdir(parents=True)
    (local / "std.json").write_text(json.dumps({"marker": 1,
                                                "ts_tol_ms": 2.0}))
    monkeypatch.chdir(tmp_path)
    shadowed = get_eval_configs(["std"])[0]
    assert shadowed.get("marker") == 1 and shadowed["name"] == "std"
    with pytest.raises(FileNotFoundError):
        get_eval_configs(["no_such_config"])


def test_eval_config_sweep_families():
    t = get_eval_configs(["t40ms"])[0]
    assert t["dataset_kwargs"]["voxel_method"] == {
        "method": "t_seconds", "t": 0.04, "sliding_window_t": 0}
    k = get_eval_configs(["k15k"])[0]
    assert k["dataset_kwargs"]["voxel_method"] == {
        "method": "k_events", "k": 15000, "sliding_window_w": 0}
    kr = get_eval_configs(["kr0.4"])[0]
    assert kr["dataset_kwargs"]["keep_ratio"] == 0.4


def test_device_timer_frame_weighted_mean(capsys):
    import time

    from evreal_tpu.harness import timers

    device_timers.pop("unit-test", None)
    with DeviceTimer("unit-test", frames=10):
        pass
    # warmup exclusion: the first 5 frames (and their wall time) drop out
    with DeviceTimer("unit-test", frames=15) as t:
        time.sleep(0.01)
        t.exclude_warmup(5)
    assert len(device_timers["unit-test"]) == 2
    assert device_timers["unit-test"][1][1] == 10  # frames after warmup
    assert device_timers["unit-test"][1][0] < 10.0  # sleep excluded (ms)
    timers.print_timing_info()
    out = capsys.readouterr().out
    assert "unit-test:" in out and "(20 frames, 2 sequences)" in out
    device_timers.pop("unit-test", None)


def _write_scores(base, cond, ds, seq, model, metric, vals, start_idx=0):
    d = os.path.join(base, cond, ds, seq, model)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, metric + ".txt"), "a", encoding="utf-8") as f:
        for i, v in enumerate(vals):
            f.write(f"{start_idx + i} {v:.5f}\n")


def test_robustness_read_scores(tmp_path):
    from analysis.robustness import read_event_rate_joined, read_scores

    base = str(tmp_path / "outputs")
    _write_scores(base, "t10ms", "ECD", "s0", "E2VID", "lpips", [0.2, 0.4])
    _write_scores(base, "t20ms", "ECD", "s0", "E2VID", "lpips", [0.6])
    _write_scores(base, "t10ms", "ECD", "s0", "FireNet", "lpips", [1.0])
    means = read_scores(base, "t*ms")
    assert means["E2VID"]["t10ms"] == pytest.approx(0.3)
    assert means["E2VID"]["t20ms"] == pytest.approx(0.6)
    assert means["FireNet"]["t10ms"] == pytest.approx(1.0)

    # event-rate join: aligned and index-fallback paths
    _write_scores(base, "std", "ECD", "s0", "E2VID", "lpips", [0.1, 0.3])
    _write_scores(base, "std", "ECD", "s0", "E2VID", "event_rate",
                  [5.0, 7.0])
    _write_scores(base, "std", "ECD", "s1", "E2VID", "lpips", [0.5],
                  start_idx=3)
    _write_scores(base, "std", "ECD", "s1", "E2VID", "event_rate",
                  [9.0, 11.0], start_idx=2)
    df = read_event_rate_joined(os.path.join(base, "std"), datasets=["ECD"])
    got = sorted(zip(df["event_rate"], df["score"]))
    assert got == [(5.0, 0.1), (7.0, 0.3), (11.0, 0.5)]


def test_print_scores_table(capsys):
    from evreal_tpu.harness.tables import print_scores
    from evreal_tpu.metrics.tracker import MetricTracker

    mt = MetricTracker()
    mt.update("mse", 0.125, 10)
    mt.update("ssim", 0.5, 10)
    mt.update("mse", 0.375, 30)
    mt.update("ssim", 0.7, 30)
    print_scores([[mt]], ["FireNet"], ["ECD"], "std")
    out = capsys.readouterr().out
    assert "Image Quality Scores (for std config)" in out
    assert "ECD (40)" in out          # count-weighted header
    assert "MSE" in out and "SSIM" in out
    assert "0.312" in out             # (0.125*10 + 0.375*30) / 40
    assert "0.650" in out


def test_robustness_plots_render(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import pandas as pd

    from analysis.robustness import plot_condition_sweep, plot_event_rate

    means = {"E2VID": {"t10ms": 0.3, "t20ms": 0.4},
             "FireNet": {"t10ms": 0.5, "t20ms": 0.45}}
    out = tmp_path / "sweep.png"
    plot_condition_sweep(means, "duration (ms)", "LPIPS", str(out))
    assert out.exists() and out.stat().st_size > 0

    rng = np.random.default_rng(0)
    df = pd.DataFrame({"model": ["E2VID"] * 200,
                       "event_rate": rng.uniform(1e4, 1e7, 200),
                       "score": rng.uniform(0.2, 0.6, 200)})
    out2 = tmp_path / "rate.png"
    plot_event_rate(df, "LPIPS", str(out2))
    assert out2.exists() and out2.stat().st_size > 0


def test_missing_checkpoint_is_contained(tmp_path, monkeypatch, capsys):
    """A method whose checkpoint is absent prints the exception and yields
    no metrics instead of aborting the run (reference eval.py:344-352)."""
    from evreal_tpu.harness.runner import eval_method_with_config

    monkeypatch.chdir(tmp_path)  # no pretrained/ anywhere
    cfg_dir = tmp_path / "config" / "method"
    cfg_dir.mkdir(parents=True)
    (cfg_dir / "GhostNet.json").write_text(json.dumps({
        "model_name": "GhostNet",
        "model_path": "pretrained/GhostNet/model.pth",
        "event_tensor_normalization": False,
        "post_process_norm": "none"}))
    out = eval_method_with_config({"name": "std", "ts_tol_ms": 1.0},
                                  "GhostNet", [], ["mse"])
    assert out == []
    printed = capsys.readouterr().out
    assert "Exception while getting method GhostNet" in printed


def test_matmul_precision_env_knob(monkeypatch):
    import contextlib

    import jax.numpy as jnp
    import pytest

    from evreal_tpu.harness.runner import matmul_precision_ctx

    monkeypatch.setenv("EVREAL_PRECISION", "high")
    with matmul_precision_ctx(jnp.float32):
        pass  # context enters/exits cleanly at the overridden precision
    monkeypatch.setenv("EVREAL_PRECISION", "fastest")
    with pytest.raises(ValueError, match="EVREAL_PRECISION"):
        matmul_precision_ctx(jnp.float32)
    # bf16 mode ignores the knob entirely (backend default precision)
    assert isinstance(matmul_precision_ctx(jnp.bfloat16),
                      contextlib.nullcontext)
