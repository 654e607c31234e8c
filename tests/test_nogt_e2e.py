"""No-ground-truth evaluation (the TPAMI20_HDR scenario: event-only
sequences, t_seconds windowing, no-reference metrics — reference README
commands at README.md:104-107, dataset without images handled at
dataset.py:59-75 / eval_metrics.py gating)."""

import glob
import json
import os

import numpy as np
import pytest

from evreal_tpu.harness.runner import eval_method_on_sequence
from evreal_tpu.metrics import registry

from .test_end_to_end import FakeBundle


@pytest.fixture(scope="module")
def nogt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("data") / "hdr0"
    os.makedirs(d)
    rng = np.random.default_rng(5)
    n = 8000
    ts = np.sort(rng.uniform(0, 1.0, n)).astype(np.float64)
    xy = np.stack([rng.integers(0, 64, n), rng.integers(0, 48, n)],
                  axis=1).astype(np.int16)
    np.save(d / "events_ts.npy", ts)
    np.save(d / "events_xy.npy", xy)
    np.save(d / "events_p.npy", rng.integers(0, 2, n).astype(np.uint8))
    (d / "metadata.json").write_text(
        json.dumps({"sensor_resolution": [48, 64]}))
    return str(d)


def test_nogt_t_seconds_with_noref_metric(nogt_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    registry._ensure_builtins()
    registry.register("meanval", lambda img: img.mean(), no_ref=True)
    try:
        from evreal_tpu.data import Sequence

        vm = {"method": "t_seconds", "t": 0.04, "sliding_window_t": 0}
        seq = Sequence(nogt_dir, num_bins=5, voxel_method=vm)
        assert not seq.has_images and len(seq) > 0

        eval_config = {"name": "t40ms", "save_images": True,
                       "histeq": "none", "eval_infer_all": False,
                       "ts_tol_ms": 1.0, "create_video": False,
                       "dataset_kwargs": {"num_bins": 5,
                                          "voxel_method": vm}}
        method_config = {"model_name": "FireNet+",
                         "event_tensor_normalization": False,
                         "post_process_norm": "none"}
        t0, t1 = seq.get_min_max_t()
        sequence = {"name": "hdr0", "dataset": seq,
                    "start_time_s": t0, "end_time_s": t1}

        num_eval, mean_scores = eval_method_on_sequence(
            "HDR", eval_config, "FireNet+", FakeBundle("FireNet+"),
            method_config, sequence, ["mse", "ssim", "meanval"])

        out = os.path.join("outputs", "t40ms", "HDR", "hdr0", "FireNet+")
        pngs = glob.glob(os.path.join(out, "frame_*.png"))
        assert len(pngs) == len(seq)
        # FR metrics are dropped without GT; the NR metric scores per frame
        assert set(mean_scores) == {"meanval"}
        assert num_eval == len(seq)
        rows = open(os.path.join(out, "meanval.txt")).read().splitlines()
        assert len(rows) == len(seq)
        assert 0.0 <= mean_scores["meanval"] <= 1.0
        ts_rows = open(os.path.join(out, "timestamps.txt")).read().splitlines()
        assert len(ts_rows) == len(seq)
    finally:
        registry._REGISTRY.pop("meanval", None)


def test_eval_infer_all_reconstructs_everything(tmp_path, monkeypatch,
                                                tmp_path_factory):
    """std_all semantics (reference config/eval/std_all.json:12): every
    window is reconstructed and saved, but quantitative scoring still gates
    on the eval time window."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "tools"))
    from make_synthetic_sequence import make_sequence

    from evreal_tpu.data import Sequence

    d = tmp_path_factory.mktemp("data") / "seq0"
    make_sequence(str(d), height=32, width=48, duration_s=1.0, fps=20,
                  events_per_frame=500, seed=2)
    monkeypatch.chdir(tmp_path)
    seq = Sequence(str(d), num_bins=5,
                   voxel_method={"method": "between_frames"})
    start_s, end_s = 0.3, 0.6
    eval_config = {"name": "std_all", "save_images": True, "histeq": "none",
                   "eval_infer_all": True, "ts_tol_ms": 1.0,
                   "create_video": False,
                   "dataset_kwargs": {"num_bins": 5}}
    method_config = {"model_name": "FireNet+",
                     "event_tensor_normalization": False,
                     "post_process_norm": "none"}
    sequence = {"name": "seq0", "dataset": seq,
                "start_time_s": start_s, "end_time_s": end_s}
    num_eval, mean_scores = eval_method_on_sequence(
        "SYN", eval_config, "FireNet+", FakeBundle("FireNet+"),
        method_config, sequence, ["mse"])

    out = os.path.join("outputs", "std_all", "SYN", "seq0", "FireNet+")
    pngs = glob.glob(os.path.join(out, "frame_*.png"))
    assert len(pngs) == len(seq)  # every window reconstructed
    assert 0 < num_eval < len(seq)  # scoring still gated to [start, end]
    rows = open(os.path.join(out, "mse.txt")).read().splitlines()
    assert len(rows) == num_eval
