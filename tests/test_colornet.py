"""ColorNet parity: batched Bayer-channel scan + host LAB merge vs the
reference ColorNet's 5-sequential-forwards loop (real FireNet+ weights)."""

import numpy as np
import pytest

from evreal_tpu.convert import load_method_checkpoint, nest
from evreal_tpu.data.packing import pack_windows
from evreal_tpu.harness.runner import make_voxel_stage
from evreal_tpu.models import build_from_meta
from evreal_tpu.models.colornet import ColorRunner
from evreal_tpu.ops.voxelize import voxelize_scatter

from .oracle import ref_module
from .test_voxelize import random_events

CKPT = "/root/reference/pretrained/FireNet+/model.pth"


def test_colornet_matches_reference():
    import torch

    h, w, steps, nev = 32, 48, 3, 2000
    flat, meta = load_method_checkpoint("FireNet+", CKPT)
    model = build_from_meta(meta)
    params = nest(flat)

    stage = make_voxel_stage(voxelize_scatter, 5, (h, w), event_norm=False)
    runner = ColorRunner(model, params, h, w, stage)

    mm = ref_module("model.model")
    ev = ref_module("utils.event_utils")
    ckpt = torch.load(CKPT, map_location="cpu", weights_only=False)
    ref_base = mm.FireNet(**ckpt["config"]["arch"]["args"])
    ref_base.load_state_dict(ckpt["state_dict"])
    ref_base.eval()
    ref_base.num_encoders = 0
    ref_color = mm.ColorNet(ref_base)

    cap = 2048
    xs_b = np.zeros((steps, cap), np.float32)
    ys_b = np.zeros((steps, cap), np.float32)
    ts_b = np.zeros((steps, cap), np.float32)
    ps_b = np.zeros((steps, cap), np.float32)
    count = np.full((steps,), nev, np.int32)
    ref_out = []
    with torch.no_grad():
        for t in range(steps):
            xs, ys, ts, ps = random_events(nev, h, w, seed=20 + t)
            xs_b[t, :nev], ys_b[t, :nev] = xs, ys
            ts_b[t, :nev], ps_b[t, :nev] = ts - ts[0], ps
            vox = ev.events_to_voxel_torch(
                torch.tensor(xs), torch.tensor(ys),
                torch.tensor(ts - ts[0]), torch.tensor(ps), 5,
                sensor_size=(h, w))
            ref_out.append(ref_color(vox.unsqueeze(0))["image"].numpy())

    buffers = {"xs": xs_b, "ys": ys_b, "ts": ts_b, "ps": ps_b,
               "count": count}
    state = runner.init_state()
    state, cimgs, gimgs = runner.run(state, buffers)
    merged = runner.merge_host(np.asarray(cimgs), np.asarray(gimgs))

    for t in range(steps):
        ours = merged[t].transpose(2, 0, 1)  # CHW, BGR
        want = ref_out[t]
        # Both pipelines quantize to uint8 before the LAB merge; float
        # truncation boundaries flip single units which LAB amplifies a few
        # more. The per-channel float images match at 1e-4 (see
        # test_firenet_parity); here we bound the quantization noise.
        d = np.abs(ours - want) * 255
        assert d.mean() < 1.0, (t, d.mean())
        assert (d > 3).mean() < 0.02, (t, (d > 3).mean())
        assert d.max() <= 16, (t, d.max())


def test_colornet_odd_resolution_runs():
    """Odd sensor H/W: the 0::2 and 1::2 Bayer slices differ by one row/
    col, which crashed the batch-4 stack at trace (review finding). The
    chroma passes drop the odd last row/col (documented divergence); the
    run must produce finite frames."""
    h, w, nev = 33, 49, 1500
    flat, meta = load_method_checkpoint("FireNet+", CKPT)
    model = build_from_meta(meta)
    params = nest(flat)
    stage = make_voxel_stage(voxelize_scatter, 5, (h, w), event_norm=False)
    runner = ColorRunner(model, params, h, w, stage)

    xs, ys, ts, ps = random_events(nev, h, w, seed=7)
    cap = 2048
    bufs = {"xs": np.zeros((2, cap), np.int16),
            "ys": np.zeros((2, cap), np.int16),
            "ts": np.zeros((2, cap), np.float32),
            "ps": np.zeros((2, cap), np.int8),
            "count": np.full((2,), nev, np.int32)}
    for t in range(2):
        bufs["xs"][t, :nev] = xs
        bufs["ys"][t, :nev] = ys
        bufs["ts"][t, :nev] = np.asarray(ts, np.float32)
        bufs["ps"][t, :nev] = np.where(np.asarray(ps) > 0, 1, -1)
    state = runner.init_state()
    state, cimgs, gimgs = runner.run(state, bufs)
    merged = np.stack(runner.merge_host(np.asarray(cimgs),
                                        np.asarray(gimgs)))
    assert merged.shape == (2, h, w, 3)
    assert np.isfinite(merged).all()


def test_colornet_honors_chunk_t_env(monkeypatch):
    monkeypatch.setenv("EVREAL_CHUNK_T", "4")
    flat, meta = load_method_checkpoint("FireNet+", CKPT)
    model = build_from_meta(meta)
    stage = make_voxel_stage(voxelize_scatter, 5, (16, 16),
                             event_norm=False)
    assert ColorRunner(model, nest(flat), 16, 16, stage).chunk_t == 4
