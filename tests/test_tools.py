"""Converter tool tests: txt/bin round-trips against reference converter
semantics, loadable by the data layer."""

import os
import subprocess
import sys

import numpy as np

from evreal_tpu.data import Sequence

TOOLS = "/root/repo/tools"
sys.path.insert(0, TOOLS)


def test_txt_to_npy_roundtrip(tmp_path):
    import txt_to_npy as t2n

    rng = np.random.default_rng(0)
    n, w, h = 500, 64, 48
    ts = np.sort(rng.uniform(0, 1, n))
    xs = rng.integers(0, w, n)
    ys = rng.integers(0, h, n)
    ps = rng.integers(0, 2, n)
    txt = tmp_path / "seq.txt"
    with open(txt, "w", encoding="utf-8") as f:
        f.write(f"{w} {h}\n")
        for row in zip(ts, xs, ys, ps):
            f.write("{:.9f} {} {} {}\n".format(*row))
    out = tmp_path / "seq"
    out.mkdir()
    t2n.txt_to_npy(str(txt), str(out))

    seq = Sequence(str(out), num_bins=5,
                   voxel_method={"method": "k_events", "k": 100,
                                 "sliding_window_w": 0})
    assert seq.sensor_resolution == (h, w)
    assert seq.num_events == n
    assert not seq.has_images
    xs2, ys2, ts2, ps2 = seq.events(0, n)
    np.testing.assert_array_equal(xs2, xs.astype(np.float32))
    np.testing.assert_allclose(ts2, ts - ts.min(), atol=1e-9)
    np.testing.assert_array_equal(ps2, ps * 2.0 - 1.0)


def test_bin_to_npy_matches_reference_semantics(tmp_path):
    import bin_to_npy as b2n

    rng = np.random.default_rng(1)
    n = 300
    xs = rng.integers(0, 34, n).astype(np.uint8)
    ys = rng.integers(0, 34, n).astype(np.uint8)
    ps = rng.integers(0, 2, n).astype(np.uint32)
    ts = np.sort(rng.integers(0, 2 ** 13 - 1, n)).astype(np.uint32)
    # insert an overflow marker (y=240) midway
    raw = []
    for i in range(n):
        if i == n // 2:
            raw += [0, 240, 0, 0, 0]
        b2 = (ps[i] << 7) | ((ts[i] >> 16) & 127)
        raw += [int(xs[i]), int(ys[i]), int(b2), int((ts[i] >> 8) & 255),
                int(ts[i] & 255)]
    path = tmp_path / "x.bin"
    np.array(raw, np.uint8).tofile(path)
    out = tmp_path / "x"
    out.mkdir()
    b2n.bin_to_npy(str(path), str(out))

    got_ts = np.load(out / "events_ts.npy")
    got_xy = np.load(out / "events_xy.npy")
    got_p = np.load(out / "events_p.npy")
    assert len(got_ts) == n
    # second half gets +2^13 us
    want = ts.astype(np.float64)
    want[n // 2:] += 2 ** 13
    np.testing.assert_allclose(got_ts, want / 1e6, atol=1e-12)
    np.testing.assert_array_equal(got_xy[:, 0], xs)
    np.testing.assert_array_equal(got_p, ps.astype(bool))


def test_extract_gt_images(tmp_path):
    sys.path.insert(0, TOOLS)
    from make_synthetic_sequence import make_sequence
    import extract_gt_images as egi

    d = tmp_path / "seq"
    make_sequence(str(d), height=16, width=24, duration_s=0.5, fps=10,
                  events_per_frame=100)
    out = tmp_path / "gt"
    egi.extract_gt_images(str(d), str(out))
    assert len(list(out.glob("frame_*.png"))) == 5


def test_bag_image_decode_encodings():
    """_decode_image_mono8 must honor encoding + row stride (the reference
    used CvBridge(msg, 'mono8'); raw reshape broke rgb8/step-padded bags)."""
    import sys as _sys
    import types

    sys.path.insert(0, "/root/repo/tools")
    from bag_to_npy import _decode_image_mono8

    def msg(h, w, data, encoding, step=0):
        m = types.SimpleNamespace()
        m.height, m.width, m.data, m.encoding, m.step = h, w, data, encoding, step
        m.is_bigendian = 0
        return m

    rng = np.random.default_rng(0)
    mono = rng.integers(0, 255, (4, 6), dtype=np.uint8)
    out = _decode_image_mono8(msg(4, 6, mono.tobytes(), "mono8"))
    assert np.array_equal(out, mono)

    # step-padded mono8 (stride 8 > width 6)
    padded = np.zeros((4, 8), np.uint8)
    padded[:, :6] = mono
    out = _decode_image_mono8(msg(4, 6, padded.tobytes(), "mono8", step=8))
    assert np.array_equal(out, mono)

    # rgb8 -> grayscale, same shape
    rgb = rng.integers(0, 255, (4, 6, 3), dtype=np.uint8)
    out = _decode_image_mono8(msg(4, 6, rgb.tobytes(), "rgb8"))
    assert out.shape == (4, 6) and out.dtype == np.uint8

    # unknown encoding fails clearly
    import pytest
    with pytest.raises(ValueError, match="unsupported image encoding"):
        _decode_image_mono8(msg(4, 6, mono.tobytes(), "yuv422"))
