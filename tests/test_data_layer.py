"""Data-layer parity: Sequence windowing + device voxelization vs the
reference MemMapDataset over all three voxel methods."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")
from make_synthetic_sequence import make_sequence  # noqa: E402

from evreal_tpu.data import Sequence, pack_windows
from evreal_tpu.ops.voxelize import voxelize

from .oracle import ref_module


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("data") / "synthetic"
    make_sequence(str(d), height=32, width=48, duration_s=1.0, fps=20,
                  events_per_frame=800, seed=3)
    return str(d)


VOXEL_METHODS = [
    {"method": "between_frames"},
    {"method": "t_seconds", "t": 0.06, "sliding_window_t": 0},
    {"method": "k_events", "k": 1500, "sliding_window_w": 0},
    # sliding-window overlap variants (dataset.py:104-130)
    {"method": "t_seconds", "t": 0.06, "sliding_window_t": 0.02},
    {"method": "k_events", "k": 1500, "sliding_window_w": 300},
]


@pytest.mark.parametrize(
    "vm", VOXEL_METHODS,
    ids=lambda m: m["method"] + (
        "_overlap" if m.get("sliding_window_t") or m.get("sliding_window_w")
        else ""))
def test_windows_match_reference(seq_dir, vm):
    ds_mod = ref_module("dataset")
    ref = ds_mod.MemMapDataset(seq_dir, num_bins=5, voxel_method=dict(vm))
    ours = Sequence(seq_dir, num_bins=5, voxel_method=dict(vm))
    assert len(ours) == len(ref)

    indices = list(range(len(ours)))
    buffers, metas = pack_windows(ours, indices)

    for i in indices:
        item = ref[i]
        meta = metas[i]
        assert meta["event_count"] == item["event_count"]
        np.testing.assert_allclose(meta["dt"], item["dt"].item(), rtol=1e-9)
        np.testing.assert_allclose(meta["voxel_timestamp"],
                                   item["voxel_timestamp"].item(), rtol=1e-9)
        np.testing.assert_allclose(meta["frame_timestamp"],
                                   item["frame_timestamp"].item(), rtol=1e-9)
        frame = ours.frame(meta["frame_index"])
        np.testing.assert_allclose(frame, item["frame"][0].numpy(), atol=1e-7)

        got = np.asarray(voxelize(
            buffers["xs"][i], buffers["ys"][i], buffers["ts"][i],
            buffers["ps"][i], buffers["count"][i], num_bins=5,
            sensor_size=ours.sensor_resolution))
        np.testing.assert_allclose(got, item["events"].numpy(), atol=1e-4,
                                   err_msg=f"window {i}")


def test_k_overlap_out_of_bounds_error_parity(seq_dir):
    """With a large k overlap the reference's own window table runs past the
    event array and __getitem__ raises (dataset.py:196-198); we reproduce
    the same error on the same window index."""
    vm = {"method": "k_events", "k": 1500, "sliding_window_w": 500}
    ds_mod = ref_module("dataset")
    ref = ds_mod.MemMapDataset(seq_dir, num_bins=5, voxel_method=dict(vm))
    ours = Sequence(seq_dir, num_bins=5, voxel_method=dict(vm))
    assert len(ours) == len(ref)
    bad = next(i for i, (lo, hi) in enumerate(ours.event_indices)
               if hi > ours.num_events)
    with pytest.raises(ValueError, match="out of bounds"):
        ref[bad]
    with pytest.raises(ValueError, match="out of bounds"):
        ours.window(bad)
    # windows before the overrun still match
    assert ours.window(bad - 1)["event_count"] == \
        ref[bad - 1]["event_count"]


def test_keep_ratio_seeded(seq_dir):
    a = Sequence(seq_dir, keep_ratio=0.5, seed=7)
    b = Sequence(seq_dir, keep_ratio=0.5, seed=7)
    c = Sequence(seq_dir, keep_ratio=0.5, seed=8)
    assert a.frames_to_use == b.frames_to_use
    assert a.frames_to_use != c.frames_to_use
    assert len(a) == int(a.num_frames * 0.5) - 1


def test_min_max_t(seq_dir):
    ds_mod = ref_module("dataset")
    ref = ds_mod.MemMapDataset(seq_dir, num_bins=5)
    ours = Sequence(seq_dir, num_bins=5)
    assert ours.get_min_max_t() == ref.get_min_max_t()
    assert ours.sensor_resolution == tuple(ref.sensor_resolution)


def test_single_frame_sequence_loads(tmp_path):
    """A sequence with exactly one GT frame must open: squeeze() on a (1,1)
    images_ts would collapse it to an un-iterable 0-d scalar."""
    d = tmp_path / "one_frame"
    d.mkdir()
    n = 50
    rng = np.random.default_rng(0)
    ts = np.sort(rng.uniform(0, 0.5, n))
    np.save(d / "events_ts.npy", ts[:, None])
    np.save(d / "events_xy.npy",
            rng.integers(0, 16, (n, 2)).astype(np.int16))
    np.save(d / "events_p.npy", rng.integers(0, 2, n).astype(np.uint8))
    np.save(d / "images.npy", np.zeros((1, 16, 16, 1), np.uint8))
    np.save(d / "images_ts.npy", np.array([[0.25]]))
    np.save(d / "image_event_indices.npy",
            np.array([[np.searchsorted(ts, 0.25)]], np.int64))
    (d / "metadata.json").write_text('{"sensor_resolution": [16, 16]}')

    seq = Sequence(str(d), num_bins=5,
                   voxel_method={"method": "t_seconds", "t": 0.1,
                                 "sliding_window_t": 0})
    assert seq.frame_ts == [0.25]
    assert len(seq) > 0 and seq.window(0)["frame_index"] == 0


def test_non_monotonic_image_event_indices_empty_window(tmp_path):
    """Decreasing image_event_indices (repair only fixes isolated frame-ts
    errors) must yield an empty window like the reference's empty slice,
    not a negative event_count that blows up the packer."""
    d = tmp_path / "nonmono"
    d.mkdir()
    n = 100
    rng = np.random.default_rng(1)
    ts = np.sort(rng.uniform(0, 1.0, n))
    np.save(d / "events_ts.npy", ts[:, None])
    np.save(d / "events_xy.npy",
            rng.integers(0, 16, (n, 2)).astype(np.int16))
    np.save(d / "events_p.npy", rng.integers(0, 2, n).astype(np.uint8))
    np.save(d / "images.npy", np.zeros((3, 16, 16, 1), np.uint8))
    np.save(d / "images_ts.npy", np.array([[0.2], [0.5], [0.8]]))
    # frame 1's index goes backwards
    np.save(d / "image_event_indices.npy",
            np.array([[60], [10], [90]], np.int64))
    (d / "metadata.json").write_text('{"sensor_resolution": [16, 16]}')

    seq = Sequence(str(d), num_bins=5,
                   voxel_method={"method": "between_frames"})
    m = seq.window(0)  # window between frames 0 and 1: indices 60 -> 10
    assert m["event_count"] == 0 and m["idx0"] == m["idx1"]
    from evreal_tpu.data.packing import pack_windows

    buffers, _ = pack_windows(seq, [0, 1], capacity=2048)
    assert buffers["count"][0] == 0


def test_pack_windows_validates_all_out_buffers(seq_dir):
    """An undersized non-xs out buffer must be rejected — the native packer
    writes rows at stride `capacity` with no bounds check."""
    import pytest

    seq = Sequence(seq_dir, num_bins=5,
                   voxel_method={"method": "between_frames"})
    from evreal_tpu.data.packing import pack_windows

    t, cap = 2, 2048
    out = {"xs": np.zeros((t, cap), np.int16),
           "ys": np.zeros((t, cap), np.int16),
           "ts": np.zeros((t, cap // 2), np.float32),  # undersized
           "ps": np.zeros((t, cap), np.int8),
           "count": np.zeros((t,), np.int32)}
    with pytest.raises(AssertionError):
        pack_windows(seq, [0, 1], capacity=cap, out=out)


def test_windowing_config_fuzz_vs_reference(seq_dir):
    """Random voxel_method configs (t/k values, sliding windows) produce
    identical window tables and per-item metadata to the reference
    MemMapDataset."""
    ds_mod = ref_module("dataset")
    rng = np.random.default_rng(11)
    for _ in range(10):
        mode = ["between_frames", "t_seconds",
                "k_events"][int(rng.integers(3))]
        vm = {"method": mode}
        if mode == "t_seconds":
            vm["t"] = float(rng.uniform(0.01, 0.2))
            vm["sliding_window_t"] = float(
                rng.choice([0.0, rng.uniform(0, vm["t"])]))
        elif mode == "k_events":
            vm["k"] = int(rng.integers(50, 3000))
            vm["sliding_window_w"] = int(
                rng.choice([0, rng.integers(0, vm["k"])]))
        try:
            ref = ds_mod.MemMapDataset(seq_dir, num_bins=5,
                                       voxel_method=dict(vm))
        except Exception:
            with pytest.raises(Exception):
                s = Sequence(seq_dir, num_bins=5, voxel_method=dict(vm))
                s.windows()
            continue
        ours = Sequence(seq_dir, num_bins=5, voxel_method=dict(vm))
        assert len(ref) == len(ours), vm
        for idx in rng.choice(max(len(ref), 1),
                              size=min(4, len(ref)), replace=False):
            idx = int(idx)
            item = ref[idx]
            m = ours.window(idx)
            for key in ("voxel_timestamp", "frame_timestamp", "dt",
                        "event_count"):
                rv = float(item[key])
                ov = float(m[key] if m[key] is not None else 0.0)
                assert abs(rv - ov) <= 1e-9, (vm, idx, key, rv, ov)
