"""All-eight-methods end-to-end: synthesize random torch checkpoints in the
reference's four schemas (eval.py:124-158), then drive ``evaluate`` through
config resolution, auto-conversion, model build, batched eval and score-table
aggregation on a tiny synthetic dataset — and assert every method's
per-frame MSE/SSIM against a full reference-semantics torch chain
(windowing -> input norm -> CropParameters pad -> model -> crop ->
post-norm -> clip -> gating -> metrics; eval.py:189-246 +
eval_metrics.py:244-273), extending the FireNet/FireNet+ golden-chain
locks (tests/test_golden_scores.py) to all six remaining methods."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")
from make_synthetic_sequence import make_sequence  # noqa: E402

from evreal_tpu.convert.torch_ckpt import _install_parse_config_shim

from .oracle import ref_module

SMALL_UNET = {"num_bins": 5, "base_num_channels": 8, "kernel_size": 3,
              "num_encoders": 2, "recurrent_block_type": "convlstm",
              "num_residual_blocks": 1, "skip_type": "sum", "norm": None,
              "use_upsample_conv": True}
# SSL-E2VID's architecture is hard-coded in the reference loader
# (eval.py:134-139) — its raw-state_dict checkpoint carries no kwargs
SSL_KW = {"base_num_channels": 32, "kernel_size": 5, "num_bins": 5,
          "num_encoders": 3, "recurrent_block_type": "convlstm",
          "num_residual_blocks": 2, "skip_type": "sum", "norm": None,
          "use_upsample_conv": True}
# method-config flags used by BOTH the evaluate() run and the torch oracle
INPUT_NORM = ("E2VID", "FireNet")
POST_NORM = {"E2VID": "robust", "SSL-E2VID": "exprobust"}


def _config_parser(arch_type, args):
    shim = _install_parse_config_shim()
    cp = shim.ConfigParser()
    cp._config = {"arch": {"type": arch_type, "args": args}}
    return cp


def make_checkpoints(root):
    """Random-weight checkpoints for all 8 methods, reference schemas."""
    import torch

    torch.manual_seed(0)
    mm = ref_module("model.model")
    legacy = ref_module("model.legacy")
    spade = ref_module("model.spade_e2v")
    eitr = ref_module("model.eitr.eitr")

    out = {}

    def save(method, obj):
        d = os.path.join(root, "pretrained", method)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, "model.pth")
        torch.save(obj, path)
        out[method] = path

    # schema: ckpt['model'] kwargs + state_dict
    m = mm.E2VIDRecurrent(dict(SMALL_UNET))
    save("E2VID", {"model": dict(SMALL_UNET), "state_dict": m.state_dict()})

    # schema: ckpt['config']['model'] kwargs (FireNet_legacy)
    fn_cfg = {"num_bins": 5, "base_num_channels": 8, "kernel_size": 3,
              "recurrent_block_type": "convgru", "num_residual_blocks": 2,
              "recurrent_blocks": {"resblock": [0]}, "skip_type": "sum",
              "norm": "none"}
    m = legacy.FireNet_legacy(dict(fn_cfg))
    save("FireNet", {"config": {"model": fn_cfg},
                     "state_dict": m.state_dict()})

    # schema: pickled ConfigParser
    m = mm.E2VIDRecurrent(dict(SMALL_UNET))
    save("E2VID+", {"config": _config_parser(
        "E2VIDRecurrent", {"unet_kwargs": dict(SMALL_UNET)}),
        "state_dict": m.state_dict()})

    m = mm.FireNet(num_bins=5, base_num_channels=8, kernel_size=3)
    save("FireNet+", {"config": _config_parser(
        "FireNet", {"num_bins": 5, "base_num_channels": 8,
                    "kernel_size": 3}), "state_dict": m.state_dict()})

    # the dynamic decoder's 1/4-downsampled context only aligns with 3
    # encoders (decoder-0 output at H/4), as in the real HyperE2VID
    hyper_kw = dict(SMALL_UNET, use_dynamic_decoder=True,
                    recurrent_block_type="convgru", num_encoders=3)
    m = mm.E2VIDRecurrent(dict(hyper_kw))
    save("HyperE2VID", {"config": _config_parser(
        "E2VIDRecurrent", {"unet_kwargs": dict(hyper_kw)}),
        "state_dict": m.state_dict()})

    m = eitr.EITR({"num_bins": 5, "norm": None})
    save("ET-Net", {"config": _config_parser(
        "EITR", {"eitr_kwargs": {"num_bins": 5, "norm": None}}),
        "state_dict": m.state_dict()})

    # schema: checkpoint IS the state_dict
    save("SPADE-E2VID", spade.Unet6().state_dict())
    m = mm.E2VIDRecurrent(dict(SSL_KW))
    save("SSL-E2VID", m.state_dict())
    return out


def _load_ref_model(method, ckpt_path):
    """The reference's per-method checkpoint dispatch (eval.py:124-158) on
    the torch modules loaded via tests/oracle.py. Returns the model in eval
    mode with the forced num_encoders quirks applied."""
    import torch

    mm = ref_module("model.model")
    legacy = ref_module("model.legacy")
    spade = ref_module("model.spade_e2v")
    eitr = ref_module("model.eitr.eitr")
    _install_parse_config_shim()
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    forced = None
    if method == "E2VID":
        kw = dict(ckpt["model"])
        kw["final_activation"] = "sigmoid"  # eval.py:141-144
        model, sd = mm.E2VIDRecurrent(kw), ckpt["state_dict"]
    elif method == "FireNet":
        kw = dict(ckpt["config"]["model"])
        kw["final_activation"] = ""  # eval.py:145-148
        model, sd = legacy.FireNet_legacy(kw), ckpt["state_dict"]
    elif method == "FireNet+":
        model = mm.FireNet(**ckpt["config"]["arch"]["args"])
        sd, forced = ckpt["state_dict"], 0  # eval.py:154-155
    elif method in ("E2VID+", "HyperE2VID"):
        model = mm.E2VIDRecurrent(
            ckpt["config"]["arch"]["args"]["unet_kwargs"])
        sd = ckpt["state_dict"]
    elif method == "ET-Net":
        model = eitr.EITR(ckpt["config"]["arch"]["args"]["eitr_kwargs"])
        sd, forced = ckpt["state_dict"], 3  # eval.py:152-153
    elif method == "SPADE-E2VID":
        model, sd, forced = spade.Unet6(), ckpt, 3  # eval.py:130-133
    elif method == "SSL-E2VID":
        model, sd = mm.E2VIDRecurrent(dict(SSL_KW)), ckpt
    else:
        raise ValueError(method)
    model.load_state_dict(sd)
    model.eval()
    if forced is not None:
        model.num_encoders = forced
    return model


def oracle_chain_rows(method, ckpt_path, seq_dir, start_s, end_s,
                      ts_tol_ms=1.0):
    """Full reference-chain per-frame scores for one method:
    {idx: (mse, ssim)} (eval.py:189-246 + eval_metrics.py:244-273)."""
    import torch

    from .test_end_to_end import torch_normalize_event_tensor
    from .test_metrics import skimage_ssim_oracle

    ds_mod = ref_module("dataset")
    util = ref_module("utils.util")
    model = _load_ref_model(method, ckpt_path)
    model.reset_states()

    post = POST_NORM.get(method, "none")
    ds = ds_mod.MemMapDataset(seq_dir, num_bins=5,
                              voxel_method={"method": "between_frames"})
    h, w = ds.sensor_resolution
    cropper = util.CropParameters(w, h, model.num_encoders)
    rows = {}
    with torch.no_grad():
        for idx in range(len(ds)):
            item = ds[idx]
            pred_ts = item["voxel_timestamp"].item()
            if pred_ts < start_s - 10:
                continue
            if pred_ts > end_s:
                break
            voxel = item["events"]
            if method in INPUT_NORM:
                voxel = torch_normalize_event_tensor(voxel)
            voxel = cropper.pad(voxel.unsqueeze(0))
            img = cropper.crop(model(voxel)["image"])[0, 0].numpy()
            if post != "none":  # eval.py:380-395 + eval_utils.py:15-35
                x = np.exp(img) if post == "exprobust" else img
                lo = np.percentile(x.ravel(), 1)
                hi = np.percentile(x.ravel(), 99)
                img = (x - lo) / (hi - lo)
            img = np.clip(img, 0, 1)
            ref = np.clip(item["frame"][0].numpy(), 0, 1)
            ref_ts = item["frame_timestamp"].item()
            if (start_s <= pred_ts <= end_s
                    and abs(ref_ts - pred_ts) * 1000 <= ts_tol_ms):
                rows[idx] = (float(np.mean((ref - img) ** 2)),
                             skimage_ssim_oracle(img, ref))
    return rows


METHODS = ["E2VID", "E2VID+", "FireNet", "FireNet+", "SPADE-E2VID",
           "SSL-E2VID", "ET-Net", "HyperE2VID"]


@pytest.mark.slow
def test_all_eight_methods(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    ckpts = make_checkpoints(str(tmp_path))

    make_sequence(str(tmp_path / "data" / "SYN" / "seq0"), height=32,
                  width=48, duration_s=0.6, fps=15, events_per_frame=400,
                  seed=9)

    os.makedirs("config/method", exist_ok=True)
    os.makedirs("config/dataset", exist_ok=True)
    for method, path in ckpts.items():
        with open(f"config/method/{method}.json", "w",
                  encoding="utf-8") as f:
            json.dump({"model_name": method, "model_path": path,
                       "event_tensor_normalization": method in INPUT_NORM,
                       "post_process_norm": POST_NORM.get(method, "none")},
                      f)
    with open("config/dataset/SYN.json", "w", encoding="utf-8") as f:
        json.dump({"root_path": "data/SYN",
                   "sequences": {"seq0": {"start_time_s": 0.05,
                                          "end_time_s": 0.5}}}, f)

    from evreal_tpu.harness import evaluate

    evaluate(METHODS, ["std"], ["SYN"], ["mse", "ssim"])
    out = capsys.readouterr().out
    assert "Image Quality Scores" in out
    assert "Exception" not in out, out

    for method in METHODS:
        mdir = tmp_path / "outputs" / "std" / "SYN" / "seq0" / method
        assert (mdir / "timestamps.txt").exists(), method
        rows = (mdir / "mse.txt").read_text().splitlines()
        assert rows, method
        for row in rows:
            val = float(row.split()[1])
            assert np.isfinite(val), (method, row)

        # full-chain parity: the same windows through the reference torch
        # chain must score identically (within f32-pipeline tolerance;
        # txt values are {:.5f}-quantized, eval_utils.py:57-69)
        want = oracle_chain_rows(method, ckpts[method],
                                 str(tmp_path / "data" / "SYN" / "seq0"),
                                 0.05, 0.5)
        got_mse = {int(r.split()[0]): float(r.split()[1])
                   for r in rows}
        got_ssim = {int(r.split()[0]): float(r.split()[1]) for r in
                    (mdir / "ssim.txt").read_text().splitlines()}
        assert set(got_mse) == set(want), (method, set(got_mse), set(want))
        for idx, (mse, ssim) in want.items():
            assert abs(got_mse[idx] - mse) < 5e-4, (method, idx,
                                                    got_mse[idx], mse)
            assert abs(got_ssim[idx] - ssim) < 5e-4, (method, idx,
                                                      got_ssim[idx], ssim)


def test_save_load_params_sidecar_roundtrip(tmp_path):
    """save_params/load_params agree on the sidecar path whether or not the
    caller includes '.npz'; a missing sidecar fails loudly (it used to
    silently return meta={} and lose the model class)."""
    from evreal_tpu.convert.torch_ckpt import load_params, save_params

    flat = {"a.weight": np.ones((2, 2), np.float32)}
    meta = {"class": "FireNet", "kwargs": {"num_bins": 5}}
    for base in ("ckpt_a", "ckpt_b.npz"):
        save_params(str(tmp_path / base), flat, meta)
        name = base if base.endswith(".npz") else base + ".npz"
        tree, got = load_params(str(tmp_path / name))
        assert got == meta
        np.testing.assert_array_equal(np.asarray(tree["a"]["weight"]),
                                      flat["a.weight"])

    np.savez(tmp_path / "bare", **flat)
    with pytest.raises(FileNotFoundError, match="sidecar"):
        load_params(str(tmp_path / "bare.npz"))
