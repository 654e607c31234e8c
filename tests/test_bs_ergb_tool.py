"""bs_ergb_to_npy converter parity vs the reference tool
(reference tools/bs_ergb_to_npy.py): subpixel fix with overflow repair,
microsecond->second zeroed timestamps, image_event_indices layout."""

import importlib.util
import os
import sys

import cv2
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "tools"))
import bs_ergb_to_npy as ours  # noqa: E402


def _load_ref():
    spec = importlib.util.spec_from_file_location(
        "ref_bs_ergb", "/root/reference/tools/bs_ergb_to_npy.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def bs_input(tmp_path):
    rng = np.random.default_rng(9)
    src = tmp_path / "seq"
    (src / "events").mkdir(parents=True)
    (src / "images").mkdir()
    n_frames, per = 4, 300
    ts_us = 1_000_000 + np.arange(n_frames) * 25_000
    with open(src / "images" / "timestamp.txt", "w") as f:
        f.writelines(f"{t}\n" for t in ts_us)
    for i in range(n_frames):
        img = rng.integers(0, 256, (16, 20, 3)).astype(np.uint8)
        cv2.imwrite(str(src / "images" / f"{i:06d}.png"), img)
    for i in range(n_frames - 1):
        x = rng.integers(0, 970 * 32, per).astype(np.uint16)
        y = rng.integers(0, 625 * 32, per).astype(np.uint16)
        # inject subpixel-overflow values (> upper_limit*32 wraps via -65536)
        x[:5] = np.array([969 * 32 + 40, 65535, 65000, 31100, 42],
                         np.uint16)
        t = (ts_us[i] + np.sort(rng.integers(0, 25_000, per))).astype(
            np.int64)
        p = rng.integers(0, 2, per).astype(np.uint8)
        np.savez(src / "events" / f"{i:06d}.npz", x=x, y=y, timestamp=t,
                 polarity=p)
    return str(src)


def test_subpixel_fix_matches_reference():
    ref = _load_ref()
    data = np.array([0, 31, 32, 33, 65535, 969 * 32 + 33, 31100],
                    np.uint16)
    np.testing.assert_array_equal(
        ours.fix_subpixel_coords(data.copy(), 969),
        ref.convert_and_fix_event_pixels(data.copy(), 969))


def test_converter_matches_reference(bs_input, tmp_path):
    ref = _load_ref()
    out_ours = str(tmp_path / "ours")
    out_ref = str(tmp_path / "ref")
    ours.bs_ergb_to_npy(bs_input, out_ours)
    ref.bs_ergb_to_memmap(bs_input, out_ref)
    for name in ("events_ts", "events_xy", "events_p", "images_ts",
                 "image_event_indices"):
        a = np.load(os.path.join(out_ours, name + ".npy"))
        b = np.load(os.path.join(out_ref, name + ".npy"))
        np.testing.assert_allclose(
            np.asarray(a, np.float64).reshape(np.asarray(b).shape),
            np.asarray(b, np.float64), atol=0, err_msg=name)
    a = np.load(os.path.join(out_ours, "images.npy"))
    b = np.load(os.path.join(out_ref, "images.npy"))
    assert a.shape[:3] == b.shape[:3]
    np.testing.assert_array_equal(a.squeeze(), b.squeeze())
