"""Compact wire formats (EVREAL_WIRE=compact / compact4): uint16
window-normalized timestamps + uint8 coordinates when the sensor fits, and
the packed one-u32-per-event wire (data/packing.py).

Covers: dtype selection, numpy-path quantization values, native C++ packer
bit-equivalence (both coordinate widths and the packed wire), out-of-range
sentinel semantics, voxel-level error bound vs the f32 wire, and end-to-end
score drift through the batched eval path (the number that justifies using
the compact wires for serving: measured 3.9e-9 MSE / 6.2e-8 SSIM for
compact, same order for compact4 — far inside the 1e-3 parity budget).
"""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")
from make_synthetic_sequence import make_sequence  # noqa: E402

from evreal_tpu import native
from evreal_tpu.data import Sequence, pack_windows
from evreal_tpu.data.packing import U16_TS_SCALE, wire_dtypes, wire_format


def _make_seq(tmp_path, h=48, w=64, n=4000, seed=7, t_hi=1.0):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.uniform(0, t_hi, n)).astype(np.float64)
    xy = np.stack([rng.integers(0, w, n), rng.integers(0, h, n)],
                  axis=1).astype(np.int16)
    p = rng.integers(0, 2, n).astype(np.uint8)
    np.save(tmp_path / "events_ts.npy", ts)
    np.save(tmp_path / "events_xy.npy", xy)
    np.save(tmp_path / "events_p.npy", p)
    (tmp_path / "metadata.json").write_text(
        json.dumps({"sensor_resolution": [h, w]}))
    return Sequence(str(tmp_path),
                    voxel_method={"method": "k_events", "k": 600,
                                  "sliding_window_w": 0})


def test_wire_format_env(monkeypatch):
    monkeypatch.delenv("EVREAL_WIRE", raising=False)
    assert wire_format() == "f32"
    monkeypatch.setenv("EVREAL_WIRE", "compact")
    assert wire_format() == "compact"
    monkeypatch.setenv("EVREAL_WIRE", "compact4")
    assert wire_format() == "compact4"
    monkeypatch.setenv("EVREAL_WIRE", "zstd")
    with pytest.raises(ValueError):
        wire_format()


def test_wire_dtypes_selection():
    f32 = wire_dtypes("f32", True, (180, 240))
    assert f32["ts"] == np.float32 and f32["xs"] == np.int16
    c = wire_dtypes("compact", True, (180, 240))
    assert c["ts"] == np.uint16 and c["xs"] == np.uint8
    # sensors wider than the u8 sentinel keep int16 coords
    big = wire_dtypes("compact", True, (260, 346))
    assert big["ts"] == np.uint16 and big["xs"] == np.int16
    # h == 255: valid coords are 0..254, the 255 sentinel stays out of
    # range -> u8 still works; h == 256 would collide (valid 255) -> i16
    assert wire_dtypes("compact", True, (255, 240))["xs"] == np.uint8
    assert wire_dtypes("compact", True, (256, 240))["xs"] == np.int16
    # fractional coords always travel f32 (device trunc semantics)
    frac = wire_dtypes("compact", False, (100, 100))
    assert frac["xs"] == np.float32 and frac["ts"] == np.uint16


def test_compact_pack_quantization_numpy(tmp_path, monkeypatch):
    monkeypatch.setattr(native, "_lib", None)  # numpy fallback
    seq = _make_seq(tmp_path)
    bufs, metas = pack_windows(seq, [0, 1, 2], capacity=1024,
                               wire="compact")
    assert bufs["ts"].dtype == np.uint16
    assert bufs["xs"].dtype == np.uint8
    m = metas[0]
    n = m["event_count"]
    ets = np.asarray(seq.t[m["idx0"]:m["idx1"]])
    dt = ets[-1] - ets[0]
    want = np.clip(np.rint((ets - ets[0]) * (U16_TS_SCALE / dt)),
                   0, U16_TS_SCALE).astype(np.uint16)
    np.testing.assert_array_equal(bufs["ts"][0, :n], want)
    assert bufs["ts"][0, n - 1] == 65535  # last event is the window end
    assert bufs["ts"][0, 0] == 0
    np.testing.assert_array_equal(bufs["xs"][0, :n],
                                  seq.xy[m["idx0"]:m["idx1"], 0])


def test_compact_native_matches_numpy_u8_and_i16(tmp_path, monkeypatch):
    if native.load() is None:
        pytest.skip("no C++ compiler available")
    for sub, (h, w) in (("small", (48, 64)), ("wide", (48, 300))):
        d = tmp_path / sub
        d.mkdir()
        seq = _make_seq(d, h=h, w=w, seed=5)
        idx = list(range(min(len(seq), 4)))
        got, _ = pack_windows(seq, idx, capacity=1024, wire="compact")
        monkeypatch.setattr(native, "_lib", None)
        want, _ = pack_windows(seq, idx, capacity=1024, wire="compact")
        monkeypatch.undo()
        assert got["xs"].dtype == (np.uint8 if sub == "small" else np.int16)
        for key in ("xs", "ys", "ts", "ps", "count"):
            np.testing.assert_array_equal(got[key], want[key],
                                          err_msg=f"{sub}:{key}")


def test_compact_degenerate_window(tmp_path, monkeypatch):
    """dt < 1e-9 windows encode the reference's linspace spread host-side
    (event_utils.py:48-49), native and numpy agreeing bit-for-bit."""
    n = 17
    ts = np.full(n, 0.5, np.float64)
    xy = np.stack([np.arange(n) % 8, np.arange(n) % 6], 1).astype(np.int16)
    p = (np.arange(n) % 2).astype(np.uint8)
    np.save(tmp_path / "events_ts.npy", ts)
    np.save(tmp_path / "events_xy.npy", xy)
    np.save(tmp_path / "events_p.npy", p)
    (tmp_path / "metadata.json").write_text(
        json.dumps({"sensor_resolution": [6, 8]}))
    seq = Sequence(str(tmp_path),
                   voxel_method={"method": "k_events", "k": n,
                                 "sliding_window_w": 0})
    bufs, _ = pack_windows(seq, [0], wire="compact")
    want = np.rint(np.arange(n) * (U16_TS_SCALE / (n - 1))).astype(np.uint16)
    np.testing.assert_array_equal(bufs["ts"][0, :n], want)
    if native.load() is not None:
        monkeypatch.setattr(native, "_lib", None)
        bufs2, _ = pack_windows(seq, [0], wire="compact")
        np.testing.assert_array_equal(bufs["ts"], bufs2["ts"])


def test_u8_sentinel_drops_oob_like_f32(tmp_path):
    """Out-of-bounds coordinates deposit nothing on either wire."""
    from evreal_tpu.harness.runner import make_voxel_stage
    from evreal_tpu.ops.voxelize import voxelize_scatter

    h, w = 40, 50
    n = 64
    rng = np.random.default_rng(0)
    ts = np.sort(rng.uniform(0, 0.1, n)).astype(np.float64)
    xy = np.stack([rng.integers(0, w, n), rng.integers(0, h, n)],
                  1).astype(np.int16)
    xy[3] = (-2, 5)       # negative -> sentinel
    xy[9] = (300, 5)      # > 255 -> sentinel
    xy[11] = (49, 45)     # in u8 range but OOB for the sensor -> guard drops
    p = rng.integers(0, 2, n).astype(np.uint8)
    np.save(tmp_path / "events_ts.npy", ts)
    np.save(tmp_path / "events_xy.npy", xy)
    np.save(tmp_path / "events_p.npy", p)
    (tmp_path / "metadata.json").write_text(
        json.dumps({"sensor_resolution": [h, w]}))
    seq = Sequence(str(tmp_path),
                   voxel_method={"method": "k_events", "k": n,
                                 "sliding_window_w": 0})

    stage = make_voxel_stage(voxelize_scatter, 5, (h, w), False)
    f32, _ = pack_windows(seq, [0], wire="f32")
    cmp_, _ = pack_windows(seq, [0], wire="compact")
    assert cmp_["xs"].dtype == np.uint8
    assert cmp_["xs"][0, 3] == 255 and cmp_["xs"][0, 9] == 255
    v_f32 = np.asarray(stage(f32))
    v_cmp = np.asarray(stage(cmp_))
    np.testing.assert_allclose(v_cmp, v_f32, atol=2e-4)
    assert np.abs(v_cmp).sum() > 0


def test_voxel_error_bound_vs_f32(tmp_path):
    """Voxel-level perturbation from the u16 quantization stays within the
    analytic bound (~3.1e-5 per event weight x events per pixel)."""
    from evreal_tpu.harness.runner import make_voxel_stage
    from evreal_tpu.ops.voxelize import voxelize_scatter

    seq = _make_seq(tmp_path, n=6000, seed=3)
    idx = list(range(min(len(seq), 6)))
    f32, metas = pack_windows(seq, idx, capacity=1024, wire="f32")
    cmp_, _ = pack_windows(seq, idx, capacity=1024, wire="compact")
    stage = make_voxel_stage(voxelize_scatter, 5, (48, 64), False)
    v_f32 = np.asarray(stage(f32))
    v_cmp = np.asarray(stage(cmp_))
    # ~600 events over 48x64x5 -> <=3 events/pixel-bin almost surely
    max_err = np.abs(v_cmp - v_f32).max()
    assert max_err < 5e-4, max_err
    assert np.abs(v_cmp).sum() > 0


def test_end_to_end_score_drift(tmp_path, monkeypatch):
    """Batched eval on the compact wire: per-frame MSE/SSIM means must sit
    within 1e-4 of the f32 wire (measured 3.9e-9 MSE / 6.2e-8 SSIM) — the evidence that
    the serving/bench configs may use it without breaking parity claims."""
    from evreal_tpu.harness.batched import eval_method_on_sequence_group

    from .test_end_to_end import FakeBundle

    d = tmp_path / "seq0"
    make_sequence(str(d), height=48, width=64, duration_s=0.8, fps=20,
                  events_per_frame=800, seed=41)
    eval_cfg = {"name": "std", "save_images": False, "histeq": "none",
                "eval_infer_all": False, "ts_tol_ms": 1.0,
                "create_video": False}
    method_cfg = {"model_name": "FireNet+",
                  "event_tensor_normalization": False,
                  "post_process_norm": "none"}

    def run(wire):
        out = tmp_path / f"out_{wire}"
        out.mkdir(exist_ok=True)
        monkeypatch.chdir(out)
        if wire == "compact":
            monkeypatch.setenv("EVREAL_WIRE", "compact")
        else:
            monkeypatch.delenv("EVREAL_WIRE", raising=False)
        seq = Sequence(str(d), num_bins=5,
                       voxel_method={"method": "between_frames"})
        res = eval_method_on_sequence_group(
            "SYNS", eval_cfg, "FireNet+", FakeBundle("FireNet+"),
            method_cfg, [{"name": "seq0", "dataset": seq,
                          "start_time_s": 0.0, "end_time_s": 10.0}],
            ["mse", "ssim"])
        return res[0]

    (n_f, s_f) = run("f32")
    (n_c, s_c) = run("compact")
    (n_4, s_4) = run("compact4")
    assert n_f == n_c == n_4 and n_f > 0
    for k in s_f:
        assert abs(s_f[k] - s_c[k]) < 1e-4, (k, s_f[k], s_c[k])
        assert abs(s_f[k] - s_4[k]) < 1e-4, (k, s_f[k], s_4[k])


# ---------------------------------------------------------------------------
# packed-u32 compact4 wire
# ---------------------------------------------------------------------------

def test_compact4_layout_and_dtypes():
    from evreal_tpu.data.packing import compact4_layout

    assert compact4_layout((180, 240)) == (16, 15)   # ECD/HQF/NCaltech
    assert compact4_layout((260, 346)) == (17, 14)   # MVSEC/CED
    assert compact4_layout((8, 8)) == (7, 16)        # ts bits capped at 16
    assert compact4_layout((1024, 1024)) is None     # < 12 ts bits
    assert compact4_layout(None) is None
    assert wire_dtypes("compact4", True, (180, 240)) == {
        "ev": np.uint32, "count": np.int32}
    # fractional coords / oversized sensors fall back to the compact wire
    assert "ev" not in wire_dtypes("compact4", False, (180, 240))
    big = wire_dtypes("compact4", True, (1024, 1024))
    assert "ev" not in big and big["ts"] == np.uint16 \
        and big["xs"] == np.int16


def test_compact4_encoding_values(tmp_path, monkeypatch):
    """Field-level decode of the numpy encoder: index, 15-bit ts fraction,
    polarity bit — and bit-identity with the native packer."""
    from evreal_tpu.data.packing import compact4_layout

    seq = _make_seq(tmp_path, h=48, w=64, n=3000, seed=11)
    idx_bits, ts_bits = compact4_layout((48, 64))
    assert (idx_bits, ts_bits) == (12, 16)
    got, metas = pack_windows(seq, [0, 1], capacity=1024, wire="compact4")
    assert got["ev"].dtype == np.uint32
    monkeypatch.setattr(native, "_lib", None)
    want, _ = pack_windows(seq, [0, 1], capacity=1024, wire="compact4")
    monkeypatch.undo()
    np.testing.assert_array_equal(got["ev"], want["ev"])
    np.testing.assert_array_equal(got["count"], want["count"])

    m = metas[0]
    n = m["event_count"]
    ev = got["ev"][0, :n].astype(np.uint64)
    xy = seq.xy[m["idx0"]:m["idx1"]]
    p = np.asarray(seq.p[m["idx0"]:m["idx1"]])
    idx = ev & ((1 << idx_bits) - 1)
    np.testing.assert_array_equal(idx, xy[:, 1].astype(np.int64) * 64
                                  + xy[:, 0])
    np.testing.assert_array_equal(ev >> 31, p.astype(np.uint64))
    q = (ev >> idx_bits) & ((1 << ts_bits) - 1)
    ets = np.asarray(seq.t[m["idx0"]:m["idx1"]])
    qmax = float((1 << ts_bits) - 1)
    want_q = np.clip(np.rint((ets - ets[0])
                             * (qmax / (ets[-1] - ets[0]))), 0, qmax)
    np.testing.assert_array_equal(q, want_q.astype(np.uint64))
    # zero tails past count
    assert not got["ev"][0, n:].any()


def test_compact4_sentinel_drops_oob(tmp_path):
    """OOB coordinates park at the h*w sentinel and deposit nothing; the
    voxel matches the f32 wire's."""
    from evreal_tpu.harness.runner import make_voxel_stage
    from evreal_tpu.ops.voxelize import voxelize_scatter

    h, w, n = 40, 50, 64
    rng = np.random.default_rng(0)
    ts = np.sort(rng.uniform(0, 0.1, n)).astype(np.float64)
    xy = np.stack([rng.integers(0, w, n), rng.integers(0, h, n)],
                  1).astype(np.int16)
    xy[3] = (-2, 5)
    xy[9] = (300, 5)
    xy[11] = (49, 45)  # x valid, y OOB
    p = rng.integers(0, 2, n).astype(np.uint8)
    np.save(tmp_path / "events_ts.npy", ts)
    np.save(tmp_path / "events_xy.npy", xy)
    np.save(tmp_path / "events_p.npy", p)
    (tmp_path / "metadata.json").write_text(
        json.dumps({"sensor_resolution": [h, w]}))
    seq = Sequence(str(tmp_path),
                   voxel_method={"method": "k_events", "k": n,
                                 "sliding_window_w": 0})
    f32b, _ = pack_windows(seq, [0], wire="f32")
    c4, _ = pack_windows(seq, [0], wire="compact4")
    from evreal_tpu.data.packing import compact4_layout

    idx_bits, _ = compact4_layout((h, w))
    sentinel = h * w
    for i in (3, 9, 11):
        assert int(c4["ev"][0, i]) & ((1 << idx_bits) - 1) == sentinel
    stage = make_voxel_stage(voxelize_scatter, 5, (h, w), False)
    v_f32 = np.asarray(stage(f32b))
    v_c4 = np.asarray(stage(c4))
    np.testing.assert_allclose(v_c4, v_f32, atol=3e-4)
    assert np.abs(v_c4).sum() > 0


def test_compact4_mvsec_scale_17bit_index(tmp_path):
    """Sensors past 2^16 pixels use a 17-bit index / 14-bit timestamp; the
    voxel still matches the f32 wire within the coarser ts quantization."""
    from evreal_tpu.harness.runner import make_voxel_stage
    from evreal_tpu.ops.voxelize import voxelize_scatter

    h, w = 260, 346
    seq = _make_seq(tmp_path, h=h, w=w, n=4000, seed=2)
    f32b, _ = pack_windows(seq, [0, 1], capacity=1024, wire="f32")
    c4, _ = pack_windows(seq, [0, 1], capacity=1024, wire="compact4")
    stage = make_voxel_stage(voxelize_scatter, 5, (h, w), False)
    v_f32 = np.asarray(stage(f32b))
    v_c4 = np.asarray(stage(c4))
    assert np.abs(v_c4 - v_f32).max() < 1e-3
    assert np.abs(v_c4).sum() > 0


def test_compact4_degenerate_window(tmp_path, monkeypatch):
    """dt < 1e-9 windows encode the linspace spread host-side, native and
    numpy bit-identical, voxel equal to the f32 wire's."""
    from evreal_tpu.harness.runner import make_voxel_stage
    from evreal_tpu.ops.voxelize import voxelize_scatter

    n = 17
    ts = np.full(n, 0.5, np.float64)
    xy = np.stack([np.arange(n) % 8, np.arange(n) % 6], 1).astype(np.int16)
    p = (np.arange(n) % 2).astype(np.uint8)
    np.save(tmp_path / "events_ts.npy", ts)
    np.save(tmp_path / "events_xy.npy", xy)
    np.save(tmp_path / "events_p.npy", p)
    (tmp_path / "metadata.json").write_text(
        json.dumps({"sensor_resolution": [6, 8]}))
    seq = Sequence(str(tmp_path),
                   voxel_method={"method": "k_events", "k": n,
                                 "sliding_window_w": 0})
    got, _ = pack_windows(seq, [0], wire="compact4")
    if native.load() is not None:
        monkeypatch.setattr(native, "_lib", None)
        want, _ = pack_windows(seq, [0], wire="compact4")
        monkeypatch.undo()
        np.testing.assert_array_equal(got["ev"], want["ev"])
    f32b, _ = pack_windows(seq, [0], wire="f32")
    stage = make_voxel_stage(voxelize_scatter, 5, (6, 8), False)
    np.testing.assert_allclose(np.asarray(stage(got)),
                               np.asarray(stage(f32b)), atol=2e-4)


def test_serve_pack_window_compact4():
    """serve's single-window packer emits the same u32 words as the data
    layer's encoder, for {0,1} and ±1 polarity conventions."""
    from evreal_tpu.data.packing import encode_compact4
    from evreal_tpu.serve import _pack_window

    h, w, n = 48, 64, 200
    rng = np.random.default_rng(4)
    xs = rng.integers(0, w, n).astype(np.int16)
    ys = rng.integers(0, h, n).astype(np.int16)
    ts = np.sort(rng.uniform(10.0, 10.5, n))
    for ps in (rng.integers(0, 2, n).astype(np.uint8),
               (rng.integers(0, 2, n) * 2 - 1).astype(np.int8)):
        bufs = _pack_window(xs, ys, ts, ps,
                            dtypes={"ev": np.uint32, "count": np.int32},
                            resolution=(h, w))
        assert bufs["ev"].dtype == np.uint32 and bufs["count"][0] == n
        want = encode_compact4(xs, ys, np.asarray(ts, np.float64), ps,
                               (h, w))
        np.testing.assert_array_equal(bufs["ev"][0, :n], want)


def test_polarity_convention_all_wires(tmp_path):
    """Every wire agrees on event sign for every on-disk polarity encoding:
    {0,1} u8, {0,255} u8 (LSB convention: 255 & 1 == 1), and signed ±1 i8
    (sign convention). Reference dataset.py:227 assumes {0,1}; the wires
    must not silently disagree on anything else (advisor round-3 finding)."""
    from evreal_tpu.data.packing import compact4_layout, polarity_bit

    h, w, n = 6, 8, 64
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, n)
    encodings = {
        "u8_01": bits.astype(np.uint8),
        "u8_0255": (bits * 255).astype(np.uint8),
        "i8_pm1": (bits * 2 - 1).astype(np.int8),
    }
    want_sign = bits.astype(np.int8) * 2 - 1
    np.testing.assert_array_equal(
        polarity_bit(encodings["u8_01"]), bits)
    np.testing.assert_array_equal(
        polarity_bit(encodings["u8_0255"]), bits)
    np.testing.assert_array_equal(
        polarity_bit(encodings["i8_pm1"]), bits)

    idx_bits, _ = compact4_layout((h, w))
    for name, p in encodings.items():
        d = tmp_path / name
        d.mkdir()
        ts = np.sort(rng.uniform(0, 0.1, n)).astype(np.float64)
        xy = np.stack([rng.integers(0, w, n), rng.integers(0, h, n)],
                      axis=1).astype(np.int16)
        np.save(d / "events_ts.npy", ts)
        np.save(d / "events_xy.npy", xy)
        np.save(d / "events_p.npy", p)
        (d / "metadata.json").write_text(
            json.dumps({"sensor_resolution": [h, w]}))
        seq = Sequence(str(d), voxel_method={"method": "k_events", "k": n,
                                             "sliding_window_w": 0})
        f32b, _ = pack_windows(seq, [0], wire="f32")
        cb, _ = pack_windows(seq, [0], wire="compact")
        c4, _ = pack_windows(seq, [0], wire="compact4")
        np.testing.assert_array_equal(f32b["ps"][0, :n], want_sign,
                                      err_msg=f"f32 wire, {name}")
        np.testing.assert_array_equal(cb["ps"][0, :n], want_sign,
                                      err_msg=f"compact wire, {name}")
        c4_bits = (c4["ev"][0, :n].astype(np.uint64) >> 31).astype(np.int8)
        np.testing.assert_array_equal(c4_bits * 2 - 1, want_sign,
                                      err_msg=f"compact4 wire, {name}")
