"""ESIM-style video->events simulator: threshold-crossing semantics,
output-format contract, and loadability by the data layer."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")

from evreal_tpu.data import Sequence


@pytest.fixture()
def frame_dir(tmp_path):
    import cv2

    d = tmp_path / "frames"
    d.mkdir()
    h, w, n = 32, 48, 12
    base = np.linspace(16, 240, w)[None, :].repeat(h, 0)
    for i in range(n):
        img = np.roll(base, 2 * i, axis=1).astype(np.uint8)
        cv2.imwrite(str(d / f"f_{i:04d}.png"), img)
    return str(d)


def test_threshold_crossing_semantics():
    import video_to_npy as v2n

    h, w = 1, 3
    ys, xs = np.mgrid[0:h, 0:w]
    ref = np.log(np.array([0.5, 0.5, 0.5]) + v2n.LOG_EPS)
    # pixel 0: +2.5 ct -> 2 ON events; pixel 1: -1.2 ct -> 1 OFF; pixel 2: 0
    ct = 0.2
    log1 = ref + np.array([2.5 * ct, -1.2 * ct, 0.0])
    (exs, eys, ets, eps), new_ref = v2n.events_between(
        ref, log1, 1.0, 2.0, ct, ys.ravel(), xs.ravel())
    assert sorted(zip(exs, eps)) == [(0, 1), (0, 1), (1, 0)]
    assert np.all((ets > 1.0) & (ets <= 2.0))
    assert np.all(np.diff(ets) >= 0)
    # first ON crossing at frac 1*ct/2.5ct = 0.4 of the interval
    on_ts = sorted(t for x, t in zip(exs, ets) if x == 0)
    assert on_ts[0] == pytest.approx(1.4)
    assert on_ts[1] == pytest.approx(1.8)
    # reference level advances by exactly the fired crossings
    np.testing.assert_allclose(new_ref - ref, [2 * ct, -ct, 0.0])


def test_video_to_npy_contract(frame_dir, tmp_path):
    import video_to_npy as v2n

    out = tmp_path / "seq"
    v2n.video_to_npy(frame_dir, str(out), fps=25.0, ct=0.15)

    ets = np.load(out / "events_ts.npy")
    exy = np.load(out / "events_xy.npy")
    ep = np.load(out / "events_p.npy")
    its = np.load(out / "images_ts.npy")
    idx = np.load(out / "image_event_indices.npy")
    assert len(ets) > 0 and np.all(np.diff(ets) >= 0)
    assert exy.dtype == np.int16 and ep.dtype == np.uint8
    assert set(np.unique(ep)) <= {0, 1}
    assert exy[:, 0].max() < 48 and exy[:, 1].max() < 32
    np.testing.assert_array_equal(
        idx, np.clip(np.searchsorted(ets, its, "right") - 1, 0,
                     len(ets) - 1))

    # loadable + voxelizable through the framework data layer
    seq = Sequence(str(out), num_bins=5,
                   voxel_method={"method": "between_frames"})
    assert seq.sensor_resolution == (32, 48)
    assert seq.has_images and len(seq) == 11
    meta = seq.window(5)
    assert meta["event_count"] > 0

    # a rightward-rolling gradient brightens trailing columns:
    # both polarities must be present in roughly mirrored amounts
    on, off = int((ep == 1).sum()), int((ep == 0).sum())
    assert on > 0 and off > 0
    assert 0.25 < on / (on + off) < 0.75


def test_unreadable_frame_fails_with_filename(frame_dir, tmp_path):
    import video_to_npy as v2n

    bad = frame_dir + "/f_0005.png"
    with open(bad, "wb") as f:
        f.write(b"not a png")
    with pytest.raises(SystemExit, match="f_0005.png"):
        list(v2n.frames_from_path(frame_dir, fps=10))


def test_mismatched_frame_shape_fails_with_filename(frame_dir):
    import cv2
    import video_to_npy as v2n

    cv2.imwrite(frame_dir + "/f_0099.png",
                np.zeros((8, 8), np.uint8))
    with pytest.raises(SystemExit, match="f_0099.png"):
        list(v2n.frames_from_path(frame_dir, fps=10))
