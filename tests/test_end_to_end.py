"""End-to-end harness parity: run the full evreal_tpu pipeline (pack ->
voxelize -> scan model -> crop -> metrics -> output files) on a synthetic
sequence with the shipped FireNet+ weights and compare per-frame MSE/SSIM
scores and output files against a faithful reference-semantics loop built
from the reference MemMapDataset + torch FireNet + CropParameters."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")
from make_synthetic_sequence import make_sequence  # noqa: E402

from evreal_tpu.convert import load_method_checkpoint, nest
from evreal_tpu.harness.runner import MethodBundle, eval_method_on_sequence
from evreal_tpu.models import build_from_meta

from .oracle import ref_module
from .test_metrics import skimage_ssim_oracle

CKPT = "/root/reference/pretrained/FireNet+/model.pth"


def torch_normalize_event_tensor(event_tensor):
    """Reference input normalization, eval.py:398-410 verbatim semantics
    (shared with the all-methods chain oracle in test_all_methods_e2e)."""
    import torch

    nonzero = event_tensor != 0
    num_nonzeros = nonzero.sum()
    if num_nonzeros > 0:
        mean = event_tensor.sum() / num_nonzeros
        stddev = torch.sqrt((event_tensor ** 2).sum() / num_nonzeros
                            - mean ** 2)
        stddev = torch.max(stddev, torch.tensor(1e-6))
        mask = nonzero.float()
        event_tensor = mask * (event_tensor - mean) / stddev
    return event_tensor


class FakeBundle:
    """MethodBundle without config-file resolution."""

    def __init__(self, method_name):
        flat, meta = load_method_checkpoint(method_name, CKPT)
        self.params = nest(flat)
        self.model = build_from_meta(meta)
        self._runners = {}
    runner_for = MethodBundle.runner_for
    batched_runner_for = MethodBundle.batched_runner_for
    color_runner_for = MethodBundle.color_runner_for


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("data") / "seq0"
    make_sequence(str(d), height=48, width=64, duration_s=1.0, fps=20,
                  events_per_frame=1200, seed=11)
    return str(d)


def reference_pipeline(seq_dir, start_s, end_s, ts_tol_ms=1.0,
                       voxel_method=None, method="FireNet+"):
    """Reference eval loop semantics (eval.py:189-246) in torch on CPU.

    ``method`` selects between the two real shipped checkpoints:
    "FireNet+" (FireNet class, num_encoders forced 0, no input norm —
    eval.py:154-155) and "FireNet" (FireNet_legacy from
    ``ckpt['config']['model']`` kwargs with final_activation forced '',
    eval.py:145-148, plus the per-tensor nonzero-mean/std input
    normalization its method config enables — eval.py:222-223, 398-410).
    """
    import torch

    ds_mod = ref_module("dataset")
    util = ref_module("utils.util")
    mm = ref_module("model.model")

    if method == "FireNet":
        legacy = ref_module("model.legacy")
        ckpt = torch.load("/root/reference/pretrained/FireNet/model.pth",
                          map_location="cpu", weights_only=False)
        kw = dict(ckpt["config"]["model"])
        kw["final_activation"] = ""
        model = legacy.FireNet_legacy(kw)
        normalize_input = True
    else:
        ckpt = torch.load(CKPT, map_location="cpu", weights_only=False)
        cfg = ckpt["config"]["arch"]
        model = mm.FireNet(**cfg["args"])
        normalize_input = False
    model.load_state_dict(ckpt["state_dict"])
    model.eval()
    if method != "FireNet":
        model.num_encoders = 0
    model.reset_states()

    normalize_event_tensor = torch_normalize_event_tensor

    ds = ds_mod.MemMapDataset(
        seq_dir, num_bins=5,
        voxel_method=voxel_method or {"method": "between_frames"})
    h, w = ds.sensor_resolution
    cropper = util.CropParameters(w, h, model.num_encoders)
    rows = []
    with torch.no_grad():
        for idx in range(len(ds)):
            item = ds[idx]
            pred_ts = item["voxel_timestamp"].item()
            if pred_ts < start_s - 10:
                continue
            if pred_ts > end_s:
                break
            voxel = item["events"]
            if normalize_input:
                voxel = normalize_event_tensor(voxel)
            voxel = cropper.pad(voxel.unsqueeze(0))
            img = cropper.crop(model(voxel)["image"])[0, 0].numpy()
            img = np.clip(img, 0, 1)
            ref = np.clip(item["frame"][0].numpy(), 0, 1)
            ref_ts = item["frame_timestamp"].item()
            ok = (start_s <= pred_ts <= end_s and
                  abs(ref_ts - pred_ts) * 1000 <= ts_tol_ms)
            if ok:
                rows.append((idx, pred_ts, float(np.mean((ref - img) ** 2)),
                             skimage_ssim_oracle(img, ref)))
    return rows


def test_full_pipeline_matches_reference(seq_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    start_s, end_s = 0.1, 0.8

    eval_config = {"name": "std", "save_images": True, "histeq": "none",
                   "eval_infer_all": False, "ts_tol_ms": 1.0,
                   "create_video": False,
                   "dataset_kwargs": {"num_bins": 5,
                                      "voxel_method": {"method": "between_frames"},
                                      "keep_ratio": 1.0}}
    method_config = {"model_name": "FireNet+",
                     "event_tensor_normalization": False,
                     "post_process_norm": "none"}

    from evreal_tpu.data import Sequence

    seq_obj = Sequence(seq_dir, num_bins=5,
                       voxel_method={"method": "between_frames"})
    sequence = {"name": "seq0", "dataset": seq_obj,
                "start_time_s": start_s, "end_time_s": end_s}

    bundle = FakeBundle("FireNet+")
    num_eval, mean_scores = eval_method_on_sequence(
        "SYN", eval_config, "FireNet+", bundle, method_config, sequence,
        ["mse", "ssim"])

    ref_rows = reference_pipeline(seq_dir, start_s, end_s)
    assert num_eval == len(ref_rows)

    out_dir = tmp_path / "outputs" / "std" / "SYN" / "seq0" / "FireNet+"
    assert (out_dir / "timestamps.txt").exists()
    mse_rows = [l.split() for l in
                (out_dir / "mse.txt").read_text().splitlines()]
    ssim_rows = [l.split() for l in
                 (out_dir / "ssim.txt").read_text().splitlines()]
    assert len(mse_rows) == len(ref_rows)

    for (ridx, _, rmse, rssim), mrow, srow in zip(ref_rows, mse_rows,
                                                  ssim_rows):
        assert int(mrow[0]) == ridx
        assert abs(float(mrow[1]) - rmse) < 2e-4, (mrow, rmse)
        assert abs(float(srow[1]) - rssim) < 2e-3, (srow, rssim)

    ref_mse = np.mean([r[2] for r in ref_rows])
    ref_ssim = np.mean([r[3] for r in ref_rows])
    assert abs(mean_scores["mse"] - ref_mse) < 1e-4
    assert abs(mean_scores["ssim"] - ref_ssim) < 1e-3

    # PNGs saved for every processed frame
    pngs = list(out_dir.glob("frame_*.png"))
    assert len(pngs) > 0
