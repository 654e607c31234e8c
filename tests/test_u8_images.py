"""Device-side PNG quantization (runner.quantize_u8) must be bit-identical
to the host path it replaces (outputs.save_inferred_image on float input:
``round(clip(img,0,1)*255)`` uint8, round-half-even), and the writer/tracker
must treat uint8 input as already quantized and None as 'nothing to save'."""

import numpy as np

from evreal_tpu.harness.outputs import save_inferred_image
from evreal_tpu.harness.runner import _quantize_u8
from evreal_tpu.metrics.tracker import EvalMetricsTracker


def test_device_quantize_bitwise_matches_host():
    rng = np.random.default_rng(0)
    x = rng.normal(0.5, 0.6, (3, 37, 41)).astype(np.float32)
    # adversarial rows: out-of-range values (post-norm images can exceed
    # [0,1]) and every exact half-integer quantization boundary, where
    # round-half-even is the difference between matching and not
    x[0, 0, :5] = [-0.25, 0.0, 1.0, 1.25, np.float32(np.nan_to_num(0.5))]
    halves = (np.arange(256, dtype=np.float32) + 0.5) / 255.0
    x[1, :7].reshape(-1)[:256] = halves

    host = np.round(np.clip(x, 0.0, 1.0) * 255).astype(np.uint8)
    dev = np.asarray(_quantize_u8(x))
    assert dev.dtype == np.uint8
    assert np.array_equal(host, dev)


def test_png_writer_u8_passthrough(tmp_path):
    a = tmp_path / "f32"
    b = tmp_path / "u8"
    a.mkdir(), b.mkdir()
    rng = np.random.default_rng(1)
    img = np.clip(rng.normal(0.5, 0.4, (32, 48)), 0, 1).astype(np.float32)

    save_inferred_image(str(a), img, 7)
    save_inferred_image(str(b), np.asarray(_quantize_u8(img)), 7)

    fa = (a / "frame_0000000007.png").read_bytes()
    fb = (b / "frame_0000000007.png").read_bytes()
    assert fa == fb


def test_tracker_update_accepts_none_image(tmp_path):
    tr = EvalMetricsTracker(save_images=True, output_dir=str(tmp_path),
                            quan_eval_metric_names=["mse"],
                            quan_eval_start_time=0.0,
                            quan_eval_end_time=10.0,
                            quan_eval_ts_tol_ms=1e9,
                            has_reference_frames=True)
    tr.update(0, None, None, 0.5, 0.5, scores={"mse": np.float32(0.25)})
    tr.finalize(0)
    assert (tmp_path / "timestamps.txt").read_text().startswith("0 ")
    assert "0.25000" in (tmp_path / "mse.txt").read_text()
    assert not list(tmp_path.glob("frame_*.png"))
