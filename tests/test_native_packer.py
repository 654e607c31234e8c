"""Native C++ packer vs the numpy fallback: bit-identical buffers, and the
compact dtypes feed the voxel stage unchanged."""

import json

import numpy as np
import pytest

from evreal_tpu import native
from evreal_tpu.data import Sequence, pack_windows


@pytest.fixture
def seq_dir(tmp_path):
    rng = np.random.default_rng(7)
    n = 5000
    ts = np.sort(rng.uniform(0, 1.0, n)).astype(np.float64)
    xy = np.stack([rng.integers(0, 64, n), rng.integers(0, 48, n)],
                  axis=1).astype(np.int16)
    p = rng.integers(0, 2, n).astype(np.uint8)
    np.save(tmp_path / "events_ts.npy", ts)
    np.save(tmp_path / "events_xy.npy", xy)
    np.save(tmp_path / "events_p.npy", p)
    (tmp_path / "metadata.json").write_text(
        json.dumps({"sensor_resolution": [48, 64]}))
    return str(tmp_path)


def _k_seq(path):
    return Sequence(path, voxel_method={"method": "k_events", "k": 700,
                                        "sliding_window_w": 0})


def test_native_builds_and_matches_numpy(seq_dir, monkeypatch):
    if native.load() is None:
        pytest.skip("no C++ compiler available")
    seq = _k_seq(seq_dir)
    idx = list(range(len(seq)))
    got, metas = pack_windows(seq, idx, capacity=1024)

    monkeypatch.setattr(native, "_lib", None)  # force the numpy fallback
    want, metas2 = pack_windows(seq, idx, capacity=1024)

    assert got["xs"].dtype == np.int16 and got["ps"].dtype == np.int8
    for key in ("xs", "ys", "ts", "ps", "count"):
        np.testing.assert_array_equal(got[key], want[key], err_msg=key)
    assert [m["event_count"] for m in metas] == \
        [m["event_count"] for m in metas2]


def test_compact_buffers_voxelize_like_float(seq_dir):
    import jax.numpy as jnp

    from evreal_tpu.harness.runner import make_voxel_stage
    from evreal_tpu.ops.voxelize import voxelize_scatter

    seq = _k_seq(seq_dir)
    buffers, _ = pack_windows(seq, [0, 1, 2], capacity=1024)
    stage = make_voxel_stage(voxelize_scatter, 5, (48, 64), False)
    vox_compact = stage(buffers)
    vox_float = stage({"xs": buffers["xs"].astype(np.float32),
                       "ys": buffers["ys"].astype(np.float32),
                       "ts": buffers["ts"],
                       "ps": buffers["ps"].astype(np.float32),
                       "count": buffers["count"]})
    np.testing.assert_allclose(np.asarray(vox_compact),
                               np.asarray(vox_float), atol=0)
    # every window's voxel mass equals its signed polarity-weight sum
    assert float(jnp.abs(vox_compact).sum()) > 0


def test_fractional_coords_pack_as_float(tmp_path):
    rng = np.random.default_rng(3)
    n = 500
    ts = np.sort(rng.uniform(0, 0.5, n)).astype(np.float64)
    xy = rng.uniform(0, 32, (n, 2)).astype(np.float32)  # subpixel (BS-ERGB)
    p = rng.integers(0, 2, n).astype(np.uint8)
    np.save(tmp_path / "events_ts.npy", ts)
    np.save(tmp_path / "events_xy.npy", xy)
    np.save(tmp_path / "events_p.npy", p)
    (tmp_path / "metadata.json").write_text(
        json.dumps({"sensor_resolution": [32, 32]}))
    seq = Sequence(str(tmp_path),
                   voxel_method={"method": "k_events", "k": 100,
                                 "sliding_window_w": 0})
    buffers, metas = pack_windows(seq, [0, 1])
    assert buffers["xs"].dtype == np.float32
    n0 = metas[0]["event_count"]
    np.testing.assert_array_equal(buffers["xs"][0, :n0], xy[:n0, 0])


def test_native_zero_event_and_full_capacity_rows(tmp_path, monkeypatch):
    """Edge rows through the C++ packer: n==0 (all-zero row), n==capacity,
    and a window ending exactly at the last event."""
    if native.load() is None:
        pytest.skip("no C++ compiler available")
    rng = np.random.default_rng(11)
    n = 2000
    ts = np.sort(rng.uniform(0, 1.0, n)).astype(np.float64)
    xy = np.stack([rng.integers(0, 64, n), rng.integers(0, 48, n)],
                  axis=1).astype(np.int16)
    p = rng.integers(0, 2, n).astype(np.uint8)
    np.save(tmp_path / "events_ts.npy", ts)
    np.save(tmp_path / "events_xy.npy", xy)
    np.save(tmp_path / "events_p.npy", p)
    (tmp_path / "metadata.json").write_text(
        json.dumps({"sensor_resolution": [48, 64]}))

    seq = Sequence(str(tmp_path),
                   voxel_method={"method": "k_events", "k": 100,
                                 "sliding_window_w": 0})
    # hand-crafted window table: empty, exact-capacity, ends-at-last-event
    cap = 128
    metas = [
        {"idx0": 50, "idx1": 50, "event_count": 0},      # empty
        {"idx0": 0, "idx1": cap, "event_count": cap},     # full row
        {"idx0": n - 7, "idx1": n, "event_count": 7},     # tail of array
    ]
    got, _ = pack_windows(seq, [0, 1, 2], capacity=cap, metas=list(metas))
    monkeypatch.setattr(native, "_lib", None)
    want, _ = pack_windows(seq, [0, 1, 2], capacity=cap, metas=list(metas))
    for key in ("xs", "ys", "ts", "ps", "count"):
        np.testing.assert_array_equal(got[key], want[key], err_msg=key)
    assert got["count"].tolist() == [0, cap, 7]
    assert not got["xs"][0].any() and not got["ps"][0].any()
    np.testing.assert_array_equal(got["xs"][2, :7], xy[n - 7:, 0])
