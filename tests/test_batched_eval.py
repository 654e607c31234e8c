"""Batched multi-sequence eval must reproduce the single-sequence path
exactly (per-frame scores, files, counts)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")
from make_synthetic_sequence import make_sequence  # noqa: E402

from evreal_tpu.data import Sequence
from evreal_tpu.harness.batched import eval_method_on_sequence_group
from evreal_tpu.harness.runner import eval_method_on_sequence

from .test_end_to_end import FakeBundle

EVAL_CONFIG = {"name": "std", "save_images": False, "histeq": "none",
               "eval_infer_all": False, "ts_tol_ms": 1.0,
               "create_video": False}
METHOD_CONFIG = {"model_name": "FireNet+",
                 "event_tensor_normalization": False,
                 "post_process_norm": "none"}


@pytest.fixture(scope="module")
def seq_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    dirs = []
    for i, (dur, epf) in enumerate([(0.9, 900), (1.3, 700)]):
        d = root / f"seq{i}"
        make_sequence(str(d), height=48, width=64, duration_s=dur, fps=20,
                      events_per_frame=epf, seed=30 + i)
        dirs.append(str(d))
    return dirs


def _sequences(seq_dirs):
    out = []
    for i, d in enumerate(seq_dirs):
        seq = Sequence(d, num_bins=5,
                       voxel_method={"method": "between_frames"})
        out.append({"name": f"seq{i}", "dataset": seq,
                    "start_time_s": 0.1, "end_time_s": 10.0})
    return out


def test_batched_matches_single(seq_dirs, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    bundle = FakeBundle("FireNet+")

    single = [eval_method_on_sequence(
        "SYNS", EVAL_CONFIG, "FireNet+", bundle, METHOD_CONFIG, s,
        ["mse", "ssim"]) for s in _sequences(seq_dirs)]
    single_rows = [
        (tmp_path / "outputs/std/SYNS" / f"seq{i}" / "FireNet+" /
         "mse.txt").read_text() for i in range(2)]

    monkeypatch.chdir(tmp_path / "..")
    batched_dir = tmp_path.parent / "batched_out"
    batched_dir.mkdir(exist_ok=True)
    monkeypatch.chdir(batched_dir)
    batched = eval_method_on_sequence_group(
        "SYNS", EVAL_CONFIG, "FireNet+", bundle, METHOD_CONFIG,
        _sequences(seq_dirs), ["mse", "ssim"])

    assert len(batched) == 2
    for i, ((n0, s0), (n1, s1)) in enumerate(zip(single, batched)):
        assert n0 == n1, i
        for k in s0:
            assert abs(s0[k] - s1[k]) < 1e-5, (i, k, s0[k], s1[k])
        rows_b = (batched_dir / "outputs/std/SYNS" / f"seq{i}" / "FireNet+" /
                  "mse.txt").read_text()
        assert rows_b == single_rows[i], i


def test_batched_histeq_matches_single(seq_dirs, tmp_path, monkeypatch):
    """hist-eq path: whole-chunk batched metric scoring must equal the
    single-sequence per-chunk path."""
    cfg = dict(EVAL_CONFIG, name="std", histeq="global", save_images=True)

    single_dir = tmp_path / "single"
    single_dir.mkdir()
    monkeypatch.chdir(single_dir)
    bundle = FakeBundle("FireNet+")
    single = [eval_method_on_sequence(
        "SYNS", cfg, "FireNet+", bundle, METHOD_CONFIG, s,
        ["mse", "ssim"]) for s in _sequences(seq_dirs)]
    single_rows = [
        (single_dir / "outputs/std/SYNS" / f"seq{i}" / "FireNet+" /
         "mse.txt").read_text() for i in range(2)]

    batched_dir = tmp_path / "batched"
    batched_dir.mkdir()
    monkeypatch.chdir(batched_dir)
    batched = eval_method_on_sequence_group(
        "SYNS", cfg, "FireNet+", bundle, METHOD_CONFIG,
        _sequences(seq_dirs), ["mse", "ssim"])

    for i, ((n0, s0), (n1, s1)) in enumerate(zip(single, batched)):
        assert n0 == n1, i
        for k in s0:
            assert abs(s0[k] - s1[k]) < 1e-5, (i, k, s0[k], s1[k])
        rows_b = (batched_dir / "outputs/std/SYNS" / f"seq{i}" / "FireNet+" /
                  "mse.txt").read_text()
        assert rows_b == single_rows[i], i
        proc = list((batched_dir / "outputs/std/SYNS" / f"seq{i}").glob(
            "FireNet+_processed/frame_*.png"))
        assert proc, "processed PNGs missing"


def test_batched_group_with_mixed_gt_availability(seq_dirs, tmp_path,
                                                  monkeypatch):
    """A lockstep group mixing a with-GT and an events-only sequence: the
    GT sequence scores FR metrics, the other only writes frames."""
    import json
    import os

    import numpy as np

    d = tmp_path / "nogt_seq"
    d.mkdir()
    rng = np.random.default_rng(12)
    n = 4000
    ts = np.sort(rng.uniform(0, 1.0, n)).astype(np.float64)
    np.save(d / "events_ts.npy", ts)
    np.save(d / "events_xy.npy", np.stack(
        [rng.integers(0, 64, n), rng.integers(0, 48, n)], 1).astype(np.int16))
    np.save(d / "events_p.npy", rng.integers(0, 2, n).astype(np.uint8))
    (d / "metadata.json").write_text(json.dumps(
        {"sensor_resolution": [48, 64]}))

    vm = {"method": "t_seconds", "t": 0.05, "sliding_window_t": 0}
    gt_seq = Sequence(seq_dirs[0], num_bins=5, voxel_method=dict(vm))
    ev_seq = Sequence(str(d), num_bins=5, voxel_method=dict(vm))
    group = [{"name": "with_gt", "dataset": gt_seq,
              "start_time_s": 0.0, "end_time_s": 10.0},
             {"name": "no_gt", "dataset": ev_seq,
              "start_time_s": 0.0, "end_time_s": 10.0}]

    monkeypatch.chdir(tmp_path)
    cfg = dict(EVAL_CONFIG, ts_tol_ms=1e9, save_images=True)
    results = eval_method_on_sequence_group(
        "MIX", cfg, "FireNet+", FakeBundle("FireNet+"), METHOD_CONFIG,
        group, ["mse", "ssim"])
    (n_gt, s_gt), (n_ev, s_ev) = results
    assert n_gt > 0 and set(s_gt) == {"mse", "ssim"}
    # without GT the FR metrics are dropped (no scores recorded), but the
    # windows still count as quan-evaluated — same as the reference's
    # gating (eval_metrics.py:267-273) and our single-sequence path
    assert n_ev == len(ev_seq) and s_ev == {}
    base = tmp_path / "outputs/std/MIX"
    assert list((base / "no_gt" / "FireNet+").glob("frame_*.png"))
    assert not (base / "no_gt" / "FireNet+" / "mse.txt").exists() or \
        (base / "no_gt" / "FireNet+" / "mse.txt").read_text() == ""


def test_batched_runner_honors_chunk_t_env():
    """BatchedRunner defaults to the EVREAL_CHUNK_T-derived DEFAULT_CHUNK_T
    (it used to hardcode 32, silently ignoring the documented knob)."""
    from evreal_tpu.harness import runner as runner_mod
    from evreal_tpu.harness.batched import BatchedRunner
    from evreal_tpu.models import build_model
    from evreal_tpu.models.init import init_firenet

    model = build_model("FireNet", {"num_bins": 5, "base_num_channels": 8,
                                    "kernel_size": 3})
    r = BatchedRunner(model, init_firenet(base_num_channels=8),
                      event_norm=False, post_norm="none", height=32,
                      width=40, num_bins=5, n=2)
    assert r.chunk_t == runner_mod.DEFAULT_CHUNK_T


def test_batch_n_caps_group_width():
    """EVREAL_BATCH_N splits oversized same-resolution groups."""
    from evreal_tpu.harness.runner import split_groups

    groups = [[1, 2, 3, 4, 5], [6]]
    assert split_groups(groups, 2) == [[1, 2], [3, 4], [5], [6]]
    assert split_groups(groups, 0) == groups  # unlimited
