"""GT reference frames upload as raw uint8 (runner.derefs converts on
device). This must be invisible: the LUT conversion is bit-identical to
Sequence.frame's host astype(f32)/255 for every byte value (a traced f32
divide is NOT — XLA strength-reduces /255 to a reciprocal multiply, 1-ulp
off on 126/256 values), and whole runs score byte-identically whether the
refs cross the tunnel as uint8 or float32."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo/tools")
from make_synthetic_sequence import make_sequence  # noqa: E402

from evreal_tpu.data import Sequence
from evreal_tpu.harness import staging
from evreal_tpu.harness.batched import eval_method_on_sequence_group
from evreal_tpu.harness.runner import derefs, eval_method_on_sequence

from .test_end_to_end import FakeBundle

EVAL_CONFIG = {"name": "std", "save_images": False, "histeq": "none",
               "eval_infer_all": False, "ts_tol_ms": 1.0,
               "create_video": False}
METHOD_CONFIG = {"model_name": "FireNet+",
                 "event_tensor_normalization": False,
                 "post_process_norm": "none"}


def test_derefs_lut_bitwise_matches_host():
    u = np.arange(256, dtype=np.uint8)
    host = u.astype(np.float32) / 255.0
    dev = np.asarray(derefs(u))
    assert dev.dtype == np.float32
    assert np.array_equal(host.view(np.uint32), dev.view(np.uint32))


def test_frame_u8_matches_frame(tmp_path):
    d = tmp_path / "seq"
    make_sequence(str(d), height=24, width=32, duration_s=0.5, fps=20,
                  events_per_frame=400, seed=3)
    seq = Sequence(str(d), num_bins=5,
                   voxel_method={"method": "between_frames"})
    u8 = seq.frame_u8(0)
    assert u8 is not None and u8.dtype == np.uint8
    assert np.array_equal(u8.astype(np.float32) / 255.0, seq.frame(0))


def _force_f32_refs(monkeypatch):
    """Disable the u8 path exactly as a non-u8 memmap would."""
    monkeypatch.setattr(Sequence, "frame_u8", lambda self, i: None)


def _files(out):
    return {name: (out / name).read_bytes()
            for name in ("mse.txt", "ssim.txt", "timestamps.txt")}


def _fresh_staging(monkeypatch):
    monkeypatch.setattr(staging, "_compute_seen", False)
    monkeypatch.setattr(staging, "_staged_bytes", 0)


def test_u8_refs_serial_byte_identical(tmp_path, monkeypatch):
    seq_dir = tmp_path / "data" / "seq0"
    make_sequence(str(seq_dir), height=48, width=64, duration_s=2.2, fps=20,
                  events_per_frame=1500, seed=77)

    def run(out_root, stream):
        out_root.mkdir()
        monkeypatch.chdir(out_root)
        _fresh_staging(monkeypatch)
        if stream:
            monkeypatch.setenv("EVREAL_PRESTAGE", "0")
        else:
            monkeypatch.delenv("EVREAL_PRESTAGE", raising=False)
        seq = Sequence(str(seq_dir), num_bins=5,
                       voxel_method={"method": "between_frames"})
        res = eval_method_on_sequence(
            "SYN", EVAL_CONFIG, "FireNet+", FakeBundle("FireNet+"),
            METHOD_CONFIG, {"name": "seq0", "dataset": seq,
                            "start_time_s": 0.05, "end_time_s": 10.0},
            ["mse", "ssim"])
        return res, _files(out_root / "outputs/std/SYN/seq0/FireNet+")

    res_u8s, files_u8s = run(tmp_path / "u8_staged", stream=False)
    res_u8, files_u8 = run(tmp_path / "u8_streamed", stream=True)
    _force_f32_refs(monkeypatch)
    res_f32, files_f32 = run(tmp_path / "f32", stream=True)

    assert res_u8s == res_u8 == res_f32
    assert files_u8s == files_u8 == files_f32


def test_u8_refs_group_byte_identical(tmp_path, monkeypatch):
    seq_dir = tmp_path / "data" / "seq0"
    make_sequence(str(seq_dir), height=48, width=64, duration_s=2.2, fps=20,
                  events_per_frame=1500, seed=78)

    def run(out_root):
        out_root.mkdir()
        monkeypatch.chdir(out_root)
        _fresh_staging(monkeypatch)
        seq = Sequence(str(seq_dir), num_bins=5,
                       voxel_method={"method": "between_frames"})
        res = eval_method_on_sequence_group(
            "SYNS", EVAL_CONFIG, "FireNet+", FakeBundle("FireNet+"),
            METHOD_CONFIG, [{"name": "seq0", "dataset": seq,
                             "start_time_s": 0.05, "end_time_s": 10.0}],
            ["mse", "ssim"])
        return res, _files(out_root / "outputs/std/SYNS/seq0/FireNet+")

    res_u8, files_u8 = run(tmp_path / "u8")
    _force_f32_refs(monkeypatch)
    res_f32, files_f32 = run(tmp_path / "f32")

    assert res_u8 == res_f32
    assert files_u8 == files_f32


def test_derefs_zero_padding_is_zero():
    """pad_refs_t zero-pads u8 chunks; a zero byte must convert to 0.0 so
    padded tails score exactly as the f32 zero padding did."""
    z = np.zeros((2, 3), np.uint8)
    assert np.array_equal(np.asarray(derefs(z)),
                          np.zeros((2, 3), np.float32))


def test_u8_pool_engaged_vs_forced_f32(tmp_path, monkeypatch):
    """The batched path's ref pool really is uint8 for u8 memmaps (the
    bandwidth claim), and falls back to float32 when frame_u8 declines."""
    from evreal_tpu.harness import batched as B

    seq_dir = tmp_path / "seq0"
    make_sequence(str(seq_dir), height=24, width=32, duration_s=0.5, fps=20,
                  events_per_frame=300, seed=5)
    seen = []
    orig = B.jnp.asarray

    def spy(x, *a, **k):
        if isinstance(x, np.ndarray) and x.ndim == 4:
            seen.append(x.dtype)
        return orig(x, *a, **k)

    monkeypatch.setattr(B.jnp, "asarray", spy)
    monkeypatch.setenv("EVREAL_PRESTAGE", "0")
    monkeypatch.chdir(tmp_path)
    _fresh_staging(monkeypatch)
    seq = Sequence(str(seq_dir), num_bins=5,
                   voxel_method={"method": "between_frames"})
    eval_method_on_sequence_group(
        "SYNS", EVAL_CONFIG, "FireNet+", FakeBundle("FireNet+"),
        METHOD_CONFIG, [{"name": "seq0", "dataset": seq,
                         "start_time_s": 0.0, "end_time_s": 10.0}],
        ["mse"])
    assert np.uint8 in seen, f"u8 ref upload never engaged: {seen}"
