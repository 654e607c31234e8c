"""Auxiliary harness tests: video writer, hist-eq variants, tracker gating."""

import numpy as np

from evreal_tpu.harness.histeq import (
    equalize_clahe,
    equalize_global,
    equalize_local,
    histogram_equalization,
)
from evreal_tpu.harness.outputs import append_timestamp, save_inferred_image
from evreal_tpu.harness.video import create_vid_from_recon_folder
from evreal_tpu.metrics.tracker import EvalMetricsTracker


def test_video_writer(tmp_path):
    folder = tmp_path / "recons"
    folder.mkdir()
    rng = np.random.default_rng(0)
    for i in range(10):
        save_inferred_image(str(folder), rng.uniform(0, 1, (32, 48)), i)
        append_timestamp(str(folder / "timestamps.txt"), i, i / 20.0)
    create_vid_from_recon_folder(str(folder))
    vids = list(tmp_path.glob("recons_*Hz.mp4"))
    assert len(vids) == 1 and vids[0].stat().st_size > 0
    # fps = round(10 / 0.45) = 22
    assert "22Hz" in vids[0].name


def test_equalize_global_is_cdf():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (64, 64)).astype(np.float32)
    out = equalize_global(img)
    # uniform input -> output ~uniform CDF, monotone wrt input ordering
    flat_in = img.ravel()
    flat_out = out.ravel()
    order = np.argsort(flat_in)
    assert np.all(np.diff(flat_out[order]) >= -1e-7)
    assert 0 <= flat_out.min() and flat_out.max() <= 1


def test_equalize_clahe_shape_and_range():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (64, 64)).astype(np.float32)
    out = equalize_clahe(img)
    assert out.shape == img.shape and out.dtype == np.float32
    assert 0 <= out.min() and out.max() <= 1


def test_equalize_local_matches_bruteforce():
    """Sliding-histogram rank equalization vs a brute-force oracle."""
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (24, 24)).astype(np.float32)
    radius = 4
    got = equalize_local(img, radius=radius)

    u = np.round(np.clip(img, 0, 1) * 255).astype(np.uint8)
    h, w = u.shape
    yy, xx = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    disk = (xx * xx + yy * yy) <= radius * radius
    want = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            vals = []
            for dy in range(-radius, radius + 1):
                for dx in range(-radius, radius + 1):
                    if not disk[dy + radius, dx + radius]:
                        continue
                    py, px = y + dy, x + dx
                    if 0 <= py < h and 0 <= px < w:
                        vals.append(u[py, px])
            vals = np.array(vals)
            rank = (vals <= u[y, x]).sum()
            # skimage rank.equalize: <uint8>(255 * rank / pop) — truncation
            want[y, x] = np.floor(rank * 255.0 / len(vals)) / 255.0
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_histeq_none_passthrough():
    img = np.ones((4, 4), np.float32) * 0.3
    assert histogram_equalization(img, "none") is img


def test_tracker_gating_and_nan_dropping(tmp_path):
    tr = EvalMetricsTracker(save_images=False, output_dir=str(tmp_path),
                            quan_eval_metric_names=["mse"],
                            quan_eval_start_time=1.0, quan_eval_end_time=2.0,
                            quan_eval_ts_tol_ms=1.0,
                            has_reference_frames=True)
    img = np.zeros((8, 8), np.float32)
    tr.update(0, img, img, 0.5, 0.5, scores={"mse": 0.1})   # before window
    tr.update(1, img, img, 1.5, 1.5, scores={"mse": 0.2})   # inside
    tr.update(2, img, img, 1.6, 1.7, scores={"mse": 0.3})   # ts tol 100ms > 1ms
    tr.update(3, img, img, 1.7, 1.7, scores={"mse": float("nan")})  # NaN drop
    tr.update(4, img, img, 2.5, 2.5, scores={"mse": 0.4})   # after window
    assert tr.get_num_quan_evaluations() == 2  # idx 1 and 3 pass the gates
    assert tr.get_mean_scores()["mse"] == 0.2  # NaN dropped from scores
    rows = (tmp_path / "mse.txt").read_text().splitlines()
    assert rows == ["1 0.20000"]
    ts_rows = (tmp_path / "timestamps.txt").read_text().splitlines()
    assert len(ts_rows) == 5


def test_async_image_writer_flush_and_error(tmp_path):
    import numpy as np

    from evreal_tpu.harness.outputs import AsyncImageWriter
    from evreal_tpu.metrics.tracker import EvalMetricsTracker

    d = str(tmp_path / "out")
    tr = EvalMetricsTracker(save_images=True, output_dir=d,
                            quan_eval_metric_names=["mse"],
                            has_reference_frames=True)
    img = np.random.default_rng(0).random((16, 16)).astype(np.float32)
    for i in range(20):
        tr.update(i, img, img, float(i), float(i), scores={"mse": 0.1})
    tr.finalize(19)
    import glob
    import os
    assert len(glob.glob(os.path.join(d, "frame_*.png"))) == 20
    # a failing write surfaces at close()
    w = AsyncImageWriter()
    w.submit(str(tmp_path / "nonexistent" / "dir"), img, 0)
    import pytest as _pytest
    with _pytest.raises(Exception):
        w.close()


def test_equalize_local_native_matches_fallback():
    """The C++ sliding-histogram kernel (native/histeq.cpp) must be
    bit-identical to the per-gray-level cv2 fallback across shapes,
    including dims smaller than the disk radius."""
    from evreal_tpu import native

    if native.load() is None:
        import pytest

        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(7)
    for shape, radius in [((180, 240), 55), ((40, 30), 55), ((9, 64), 8),
                          ((64, 9), 8), ((1, 1), 3), ((100, 100), 1)]:
        img = rng.uniform(0, 1, shape).astype(np.float32)
        fast = equalize_local(img, radius=radius)
        prev, native._lib = native._lib, None  # force the fallback
        try:
            slow = equalize_local(img, radius=radius)
        finally:
            native._lib = prev
        assert np.array_equal(fast, slow), (shape, radius)


def test_async_writer_fails_fast_after_first_error(tmp_path):
    """A broken output path must surface on the next submit, not after the
    whole sequence's device compute (review finding)."""
    import numpy as np
    import pytest

    from evreal_tpu.harness.outputs import AsyncImageWriter

    w = AsyncImageWriter()
    img = np.zeros((8, 8), np.uint8)
    w.submit(str(tmp_path / "missing_dir"), img, 0)  # cv2 write fails
    deadline = 50
    with pytest.raises(OSError, match="image write"):
        for _ in range(deadline):  # the worker thread needs a beat
            import time

            time.sleep(0.05)
            w.submit(str(tmp_path / "missing_dir"), img, 1)
    # close() still reports (and does not hang)
    with pytest.raises(OSError):
        w.close()


def test_save_params_is_atomic(tmp_path):
    """save_params must never leave a partial .npz at the cache path (a
    truncated file would permanently poison checkpoint loading)."""
    import numpy as np

    from evreal_tpu.convert.torch_ckpt import load_params, save_params

    p = str(tmp_path / "m.npz")
    save_params(p, {"a.weight": np.ones((2, 2), np.float32)},
                {"class": "FireNet", "kwargs": {}})
    tree, meta = load_params(p)
    assert meta["class"] == "FireNet"
    assert not list(tmp_path.glob("*.tmp*"))  # no temp litter
