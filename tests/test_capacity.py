"""Heavy-tailed window sizes must not inflate every chunk buffer: capacity
pools are sized to the p99 bucket (plan_capacity) and the rare chunk holding
an outlier window escalates to its own bucket. Integration: a synthetic
sequence with one multi-10k-event window evaluates end-to-end with
reference-matching scores while the planned pool capacity stays minimal."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")
from make_synthetic_sequence import make_sequence  # noqa: E402

from evreal_tpu.data import Sequence, bucket_capacity, plan_capacity

from .test_end_to_end import FakeBundle, reference_pipeline


def test_plan_capacity_no_tail_matches_bucket():
    assert plan_capacity([]) == 2048
    assert plan_capacity([100] * 50) == 2048
    counts = [3000 + i for i in range(200)]
    assert plan_capacity(counts) == bucket_capacity(max(counts))


def test_plan_capacity_outlier_keeps_base_small():
    counts = [300] * 199 + [3_000_000]
    assert plan_capacity(counts) == 2048
    # but a mostly-large distribution is not treated as outliers
    counts = [100_000] * 200
    assert plan_capacity(counts) == bucket_capacity(100_000)


@pytest.fixture(scope="module")
def outlier_seq_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("data") / "seq0")
    make_sequence(d, height=48, width=64, duration_s=1.0, fps=20,
                  events_per_frame=400, seed=3)
    # inject 40k extra events into one mid window -> its count busts the
    # p99 bucket (2048) while every other window stays ~400
    ts = np.load(os.path.join(d, "events_ts.npy"))
    xy = np.load(os.path.join(d, "events_xy.npy"))
    p = np.load(os.path.join(d, "events_p.npy"))
    img_ts = np.load(os.path.join(d, "images_ts.npy")).ravel()
    t0, t1 = img_ts[8], img_ts[9]
    rng = np.random.default_rng(0)
    n_extra = 40_000
    with open(os.path.join(d, "metadata.json"), encoding="utf-8") as f:
        h, w = json.load(f)["sensor_resolution"]
    ets = np.sort(rng.uniform(t0, t1, n_extra))
    exy = np.stack([rng.integers(0, w, n_extra),
                    rng.integers(0, h, n_extra)], 1).astype(np.int16)
    ep = rng.integers(0, 2, n_extra).astype(p.dtype)
    ins = np.searchsorted(ts, ets)
    ts = np.insert(ts, ins, ets)
    xy = np.insert(xy, ins, exy, axis=0)
    p = np.insert(p, ins, ep)
    np.save(os.path.join(d, "events_ts.npy"), ts)
    np.save(os.path.join(d, "events_xy.npy"), xy)
    np.save(os.path.join(d, "events_p.npy"), p)
    idx = (np.searchsorted(ts, img_ts, "right") - 1).reshape(-1, 1)
    np.save(os.path.join(d, "image_event_indices.npy"),
            np.maximum(idx, 0).astype(np.int64))
    return d


def test_outlier_window_evaluates_without_blowup(outlier_seq_dir, tmp_path,
                                                 monkeypatch):
    from evreal_tpu.harness.runner import eval_method_on_sequence

    seq = Sequence(outlier_seq_dir, num_bins=5,
                   voxel_method={"method": "between_frames"})
    counts = [m["event_count"] for m in seq.windows()]
    assert max(counts) >= 40_000
    assert plan_capacity(counts) == 2048  # pools stay at the minimum bucket
    assert bucket_capacity(max(counts)) >= 65536

    monkeypatch.chdir(tmp_path)
    start_s, end_s = 0.05, 0.9
    eval_config = {"name": "std", "save_images": False, "histeq": "none",
                   "eval_infer_all": False, "ts_tol_ms": 1.0,
                   "create_video": False,
                   "dataset_kwargs": {
                       "num_bins": 5,
                       "voxel_method": {"method": "between_frames"},
                       "keep_ratio": 1.0}}
    method_config = {"model_name": "FireNet+",
                     "event_tensor_normalization": False,
                     "post_process_norm": "none"}
    sequence = {"name": "seq0", "dataset": seq,
                "start_time_s": start_s, "end_time_s": end_s}
    num_eval, mean_scores = eval_method_on_sequence(
        "SYN", eval_config, "FireNet+", FakeBundle("FireNet+"),
        method_config, sequence, ["mse"])

    ref_rows = reference_pipeline(outlier_seq_dir, start_s, end_s)
    assert num_eval == len(ref_rows)
    out_dir = tmp_path / "outputs" / "std" / "SYN" / "seq0" / "FireNet+"
    mse_rows = [l.split() for l in
                (out_dir / "mse.txt").read_text().splitlines()]
    for (ridx, _, rmse, _), mrow in zip(ref_rows, mse_rows):
        assert int(mrow[0]) == ridx
        assert abs(float(mrow[1]) - rmse) < 2e-4, (mrow, rmse)
