"""End-to-end color-path parity: eval_method_on_sequence with a color eval
config (reference eval.py:225-246 color branch — no quantitative metrics,
merged color PNGs + timestamps) against the reference torch ColorNet loop.
Covers the harness glue the module-level ColorRunner oracle test can't:
chunked dispatch, host merge, np post-norm, tracker color mode, PNG
output."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")
from make_synthetic_sequence import make_sequence  # noqa: E402

from .oracle import ref_module
from .test_end_to_end import FakeBundle

CKPT = "/root/reference/pretrained/FireNet+/model.pth"


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("data") / "seq0"
    make_sequence(str(d), height=48, width=64, duration_s=0.6, fps=20,
                  events_per_frame=1500, seed=21)
    return str(d)


def reference_color_rows(seq_dir, start_s, end_s):
    import torch

    ds_mod = ref_module("dataset")
    mm = ref_module("model.model")

    ckpt = torch.load(CKPT, map_location="cpu", weights_only=False)
    base = mm.FireNet(**ckpt["config"]["arch"]["args"])
    base.load_state_dict(ckpt["state_dict"])
    base.eval()
    base.num_encoders = 0
    model = mm.ColorNet(base)
    model.reset_states()

    ds = ds_mod.MemMapDataset(seq_dir, num_bins=5,
                              voxel_method={"method": "between_frames"})
    rows = []
    with torch.no_grad():
        for idx in range(len(ds)):
            item = ds[idx]
            pred_ts = item["voxel_timestamp"].item()
            if pred_ts < start_s - 10:
                continue
            if pred_ts > end_s:
                break
            out = model(item["events"].unsqueeze(0))["image"]
            img = np.transpose(torch.squeeze(out).numpy(), (1, 2, 0))
            rows.append((idx, pred_ts, img))  # float [0,1] BGR like cv2
    return rows


def test_color_eval_matches_reference(seq_dir, tmp_path, monkeypatch):
    import cv2

    from evreal_tpu.data import Sequence
    from evreal_tpu.harness.runner import eval_method_on_sequence

    monkeypatch.chdir(tmp_path)
    start_s, end_s = 0.05, 0.5
    eval_config = {"name": "color", "save_images": True, "histeq": "none",
                   "eval_infer_all": False, "ts_tol_ms": 1.0,
                   "create_video": False, "color": True,
                   "dataset_kwargs": {
                       "num_bins": 5,
                       "voxel_method": {"method": "between_frames"},
                       "keep_ratio": 1.0}}
    method_config = {"model_name": "FireNet+",
                     "event_tensor_normalization": False,
                     "post_process_norm": "none"}
    seq = Sequence(seq_dir, num_bins=5,
                   voxel_method={"method": "between_frames"})
    sequence = {"name": "seq0", "dataset": seq,
                "start_time_s": start_s, "end_time_s": end_s}
    num_eval, mean_scores = eval_method_on_sequence(
        "SYN", eval_config, "FireNet+", FakeBundle("FireNet+"),
        method_config, sequence, ["mse"])
    # color mode computes no quantitative metrics (reference
    # eval_metrics.py:272 gates on `not self.color`)
    assert num_eval == 0

    ref_rows = reference_color_rows(seq_dir, start_s, end_s)
    assert ref_rows, "reference produced no frames"
    out_dir = tmp_path / "outputs" / "color" / "SYN" / "seq0" / "FireNet+"
    ts_rows = [l.split() for l in
               (out_dir / "timestamps.txt").read_text().splitlines()]
    ts_by_idx = {int(i): float(t) for i, t in ts_rows}

    for idx, pred_ts, ref_img in ref_rows:
        assert abs(ts_by_idx[idx] - pred_ts) < 1e-9
        png = out_dir / f"frame_{idx:010d}.png"
        assert png.exists(), png
        got = cv2.imread(str(png), cv2.IMREAD_UNCHANGED)
        assert got is not None and got.shape == ref_img.shape
        want = np.round(np.clip(ref_img, 0, 1) * 255)
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 2, (idx, diff.max())

    # metric files are created empty at setup (reference
    # eval_metrics.py:315-324 truncates them) but never written in color
    # mode
    assert (out_dir / "mse.txt").read_text() == ""
