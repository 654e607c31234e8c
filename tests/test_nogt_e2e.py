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


def test_zero_event_windows_through_pipeline(tmp_path, monkeypatch):
    """Windows with no events (reference dataset.py:59-75) must flow through
    the compiled pipeline: empty voxel, event_rate 0, frames still saved."""
    import numpy as np

    d = tmp_path / "gap"
    d.mkdir()
    rng = np.random.default_rng(4)
    # events only in [0, 0.2] and [0.8, 1.0]; frames at 0.1..0.9 -> several
    # between-frame windows contain zero events
    n = 3000
    ts = np.sort(np.concatenate([rng.uniform(0, 0.2, n // 2),
                                 rng.uniform(0.8, 1.0, n // 2)]))
    np.save(d / "events_ts.npy", ts.astype(np.float64))
    np.save(d / "events_xy.npy", np.stack(
        [rng.integers(0, 32, n), rng.integers(0, 24, n)], 1).astype(np.int16))
    np.save(d / "events_p.npy", rng.integers(0, 2, n).astype(np.uint8))
    frame_ts = np.linspace(0.05, 0.95, 10)
    frames = rng.integers(0, 255, (10, 24, 32, 3)).astype(np.uint8)
    np.save(d / "images.npy", frames)
    np.save(d / "images_ts.npy", frame_ts.reshape(-1, 1))
    np.save(d / "image_event_indices.npy", np.searchsorted(
        ts, frame_ts, "right").reshape(-1, 1) - 1)
    (d / "metadata.json").write_text(json.dumps(
        {"sensor_resolution": [24, 32]}))

    from evreal_tpu.data import Sequence

    monkeypatch.chdir(tmp_path)
    seq = Sequence(str(d), num_bins=5,
                   voxel_method={"method": "between_frames"})
    metas = seq.windows()
    assert any(m["event_count"] == 0 for m in metas), "fixture needs a gap"

    eval_config = {"name": "std", "save_images": True, "histeq": "none",
                   "eval_infer_all": False, "ts_tol_ms": 1e9,
                   "create_video": False, "dataset_kwargs": {"num_bins": 5}}
    method_config = {"model_name": "FireNet+",
                     "event_tensor_normalization": False,
                     "post_process_norm": "none"}
    t0, t1 = seq.get_min_max_t()
    sequence = {"name": "gap", "dataset": seq,
                "start_time_s": t0, "end_time_s": t1}
    num_eval, mean_scores = eval_method_on_sequence(
        "SYN", eval_config, "FireNet+", FakeBundle("FireNet+"),
        method_config, sequence, ["mse"])
    assert num_eval == len(seq)
    out = os.path.join("outputs", "std", "SYN", "gap", "FireNet+")
    assert len(glob.glob(os.path.join(out, "frame_*.png"))) == len(seq)
    rates = [float(line.split()[1]) for line in
             open(os.path.join(out, "event_rate.txt"))]
    zero_idx = [i for i, m in enumerate(metas) if m["event_count"] == 0]
    assert all(rates[i] == 0.0 for i in zero_idx)


def test_eval_is_deterministic(tmp_path, monkeypatch, tmp_path_factory):
    """Two identical runs produce byte-identical score/timestamp files
    (the reference is nondeterministic only via unseeded keep_ratio, which
    we seed)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "tools"))
    from make_synthetic_sequence import make_sequence

    from evreal_tpu.data import Sequence

    d = tmp_path_factory.mktemp("data") / "seq0"
    make_sequence(str(d), height=32, width=48, duration_s=0.8, fps=20,
                  events_per_frame=400, seed=6)
    eval_config = {"name": "std", "save_images": False, "histeq": "none",
                   "eval_infer_all": False, "ts_tol_ms": 1.0,
                   "create_video": False, "dataset_kwargs": {"num_bins": 5}}
    method_config = {"model_name": "FireNet+",
                     "event_tensor_normalization": False,
                     "post_process_norm": "none"}
    bundle = FakeBundle("FireNet+")

    texts = []
    for run in ("a", "b"):
        rd = tmp_path / run
        rd.mkdir()
        monkeypatch.chdir(rd)
        seq = Sequence(str(d), num_bins=5, keep_ratio=0.8, seed=0,
                       voxel_method={"method": "between_frames"})
        t0, t1 = seq.get_min_max_t()
        sequence = {"name": "seq0", "dataset": seq,
                    "start_time_s": t0, "end_time_s": t1}
        eval_method_on_sequence("SYN", eval_config, "FireNet+", bundle,
                                method_config, sequence, ["mse", "ssim"])
        base = rd / "outputs/std/SYN/seq0/FireNet+"
        texts.append({f.name: f.read_text()
                      for f in sorted(base.iterdir())
                      if f.suffix == ".txt"})
    assert texts[0] == texts[1]
    assert set(texts[0]) == {"timestamps.txt", "mse.txt", "ssim.txt",
                             "event_rate.txt"}


def test_serial_metric_matches_vmapped(nogt_dir, tmp_path, monkeypatch):
    """serial=True metrics (lax.map over frames, for memory-heavy nets like
    MANIQA) must produce the same per-frame scores as the vmap path, in both
    the single-sequence and the batched lockstep runners."""
    monkeypatch.chdir(tmp_path)
    registry._ensure_builtins()
    fn = lambda img: (img * img).mean() + img[0, 0]  # noqa: E731
    registry.register("m_v", fn, no_ref=True)
    registry.register("m_s", fn, no_ref=True, serial=True)
    try:
        from evreal_tpu.data import Sequence
        from evreal_tpu.harness.batched import eval_method_on_sequence_group

        vm = {"method": "t_seconds", "t": 0.05, "sliding_window_t": 0}
        eval_config = {"name": "t50ms", "save_images": False,
                       "histeq": "none", "eval_infer_all": False,
                       "ts_tol_ms": 1.0, "create_video": False}
        method_config = {"model_name": "FireNet+",
                         "event_tensor_normalization": False,
                         "post_process_norm": "none"}

        def seqdict():
            seq = Sequence(nogt_dir, num_bins=5, voxel_method=vm)
            t0, t1 = seq.get_min_max_t()
            return {"name": "hdr0", "dataset": seq,
                    "start_time_s": t0, "end_time_s": t1}

        _, scores = eval_method_on_sequence(
            "HDR", eval_config, "FireNet+", FakeBundle("FireNet+"),
            method_config, seqdict(), ["m_v", "m_s"])
        assert scores["m_s"] == pytest.approx(scores["m_v"], abs=1e-6)
        single = open(os.path.join("outputs", "t50ms", "HDR", "hdr0",
                                   "FireNet+", "m_s.txt")).read()
        vmapped = open(os.path.join("outputs", "t50ms", "HDR", "hdr0",
                                    "FireNet+", "m_v.txt")).read()
        assert single.replace("m_s", "") == vmapped.replace("m_v", "")

        [(n_b, scores_b)] = eval_method_on_sequence_group(
            "HDR", eval_config, "FireNet+", FakeBundle("FireNet+"),
            method_config, [seqdict()], ["m_v", "m_s"])
        assert scores_b["m_s"] == pytest.approx(scores_b["m_v"], abs=1e-6)
        assert scores_b["m_s"] == pytest.approx(scores["m_s"], abs=1e-5)
    finally:
        registry._REGISTRY.pop("m_v", None)
        registry._REGISTRY.pop("m_s", None)
