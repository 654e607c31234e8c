"""Upload-ahead staging (harness/staging.py) is a scheduling change only:
staged runs must produce byte-identical outputs to streamed runs, engage
only before the first compute dispatch, respect the device-byte budget
(falling back to streaming mid-sequence), and fail fast on malformed
configuration."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")
from make_synthetic_sequence import make_sequence  # noqa: E402

from evreal_tpu.data import Sequence
from evreal_tpu.harness import staging
from evreal_tpu.harness.batched import eval_method_on_sequence_group
from evreal_tpu.harness.runner import eval_method_on_sequence

from .test_end_to_end import FakeBundle

EVAL_CONFIG = {"name": "std", "save_images": False, "histeq": "none",
               "eval_infer_all": False, "ts_tol_ms": 1.0,
               "create_video": False}
METHOD_CONFIG = {"model_name": "FireNet+",
                 "event_tensor_normalization": False,
                 "post_process_norm": "none"}


@pytest.fixture(autouse=True)
def fresh_staging(monkeypatch):
    """Each test starts as a fresh process would: no compute seen, empty
    budget, default env."""
    monkeypatch.setattr(staging, "_compute_seen", False)
    monkeypatch.setattr(staging, "_staged_bytes", 0)
    monkeypatch.setattr(staging, "_put_failed", False)
    monkeypatch.setattr(staging, "_canary_done", False)
    monkeypatch.setattr(staging, "_window_slow", False)
    monkeypatch.setattr(staging, "_canary_mbps", None)
    monkeypatch.delenv("EVREAL_PRESTAGE", raising=False)
    monkeypatch.delenv("EVREAL_PRESTAGE_MB", raising=False)
    monkeypatch.delenv("EVREAL_PRESTAGE_CANARY", raising=False)


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("data") / "seq0"
    # ~44 between_frames windows -> 2 chunks at the default chunk_t=32
    make_sequence(str(d), height=48, width=64, duration_s=2.2, fps=20,
                  events_per_frame=1500, seed=77)
    return str(d)


def _sequence(seq_dir):
    seq = Sequence(seq_dir, num_bins=5,
                   voxel_method={"method": "between_frames"})
    return {"name": "seq0", "dataset": seq,
            "start_time_s": 0.05, "end_time_s": 10.0}


def _run_serial(seq_dir, out_root, monkeypatch):
    monkeypatch.chdir(out_root)
    bundle = FakeBundle("FireNet+")
    result = eval_method_on_sequence(
        "SYN", EVAL_CONFIG, "FireNet+", bundle, METHOD_CONFIG,
        _sequence(seq_dir), ["mse", "ssim"])
    out = out_root / "outputs/std/SYN/seq0/FireNet+"
    files = {name: (out / name).read_bytes()
             for name in ("mse.txt", "ssim.txt", "timestamps.txt")}
    return result, files


def test_staged_serial_matches_streamed(seq_dir, tmp_path, monkeypatch):
    a = tmp_path / "staged"
    b = tmp_path / "streamed"
    a.mkdir(), b.mkdir()

    res_staged, files_staged = _run_serial(seq_dir, a, monkeypatch)
    assert staging._staged_bytes > 0, "prestage did not engage"
    assert staging._compute_seen

    monkeypatch.setenv("EVREAL_PRESTAGE", "0")
    monkeypatch.setattr(staging, "_compute_seen", False)
    monkeypatch.setattr(staging, "_staged_bytes", 0)
    res_streamed, files_streamed = _run_serial(seq_dir, b, monkeypatch)
    assert staging._staged_bytes == 0

    assert res_staged == res_streamed
    assert files_staged == files_streamed


def test_budget_exhaustion_falls_back_mid_sequence(seq_dir, tmp_path,
                                                   monkeypatch):
    """With a budget that fits the first chunk but not the second, the run
    stages what fits, streams the rest, and outputs are unchanged."""
    a = tmp_path / "full"
    b = tmp_path / "partial"
    a.mkdir(), b.mkdir()

    _, files_full = _run_serial(seq_dir, a, monkeypatch)
    total = staging._staged_bytes
    assert total > 2 ** 20, "fixture too small to exercise a 1 MB budget"

    monkeypatch.setattr(staging, "_compute_seen", False)
    monkeypatch.setattr(staging, "_staged_bytes", 0)
    budget_mb = max(1, (total // 2 + 2 ** 20 - 1) // 2 ** 20)
    monkeypatch.setenv("EVREAL_PRESTAGE_MB", str(budget_mb))
    _, files_partial = _run_serial(seq_dir, b, monkeypatch)
    assert 0 < staging._staged_bytes <= budget_mb * 2 ** 20
    assert staging._staged_bytes < total, "budget did not bite"

    assert files_partial == files_full


def test_staged_group_matches_streamed(seq_dir, tmp_path, monkeypatch):
    def run(out_root):
        monkeypatch.chdir(out_root)
        bundle = FakeBundle("FireNet+")
        results = eval_method_on_sequence_group(
            "SYNS", EVAL_CONFIG, "FireNet+", bundle, METHOD_CONFIG,
            [_sequence(seq_dir)], ["mse", "ssim"])
        out = out_root / "outputs/std/SYNS/seq0/FireNet+"
        return results, {name: (out / name).read_bytes()
                         for name in ("mse.txt", "ssim.txt",
                                      "timestamps.txt")}

    a = tmp_path / "staged"
    b = tmp_path / "streamed"
    a.mkdir(), b.mkdir()

    res_staged, files_staged = run(a)
    assert staging._staged_bytes > 0, "prestage did not engage"

    monkeypatch.setenv("EVREAL_PRESTAGE", "0")
    monkeypatch.setattr(staging, "_compute_seen", False)
    monkeypatch.setattr(staging, "_staged_bytes", 0)
    res_streamed, files_streamed = run(b)

    assert res_staged == res_streamed
    assert files_staged == files_streamed


def test_stage_inactive_after_compute():
    staging.note_compute()
    assert not staging.active()
    assert staging.stage({"x": np.zeros(4, np.float32)}) is None


def test_malformed_budget_fails_fast(monkeypatch):
    monkeypatch.setenv("EVREAL_PRESTAGE_MB", "lots")
    with pytest.raises(SystemExit, match="EVREAL_PRESTAGE_MB"):
        staging.active()


def test_put_failure_degrades_to_streaming(monkeypatch, capsys):
    """An HBM-pressure device_put failure must return None (caller streams
    the chunk) and disable staging for the rest of the process, never
    propagate."""
    import jax

    def boom(_):
        raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")

    # canary off: this test targets stage()'s own failure path
    monkeypatch.setenv("EVREAL_PRESTAGE_CANARY", "0")
    monkeypatch.setattr(jax, "device_put", boom)
    assert staging.stage({"x": np.zeros(4, np.float32)}) is None
    assert "streaming" in capsys.readouterr().out
    assert not staging.active()
    # subsequent stage() calls short-circuit without touching device_put
    monkeypatch.setattr(jax, "device_put", lambda a: a)
    assert staging.stage({"x": np.zeros(4, np.float32)}) is None


def test_canary_slow_window_disables_staging(monkeypatch, capsys):
    """When the pre-compute H2D canary exceeds its budget (the inverted
    tunnel state: pre-compute puts crawling while post-compute is fast,
    observed 2026-08-19), staging must self-disable for the process so the
    eval loops stream instead of riding a collapsed window."""
    monkeypatch.setattr(staging, "_CANARY_BUDGET_S", 0.0)  # always exceeds
    assert not staging.active()
    out = capsys.readouterr().out
    assert "canary" in out and "streaming" in out
    assert staging._canary_mbps is not None
    assert staging.stage({"x": np.zeros(4, np.float32)}) is None
    # the canary runs once per process: a second active() doesn't re-probe
    before = staging._canary_mbps
    assert not staging.active()
    assert staging._canary_mbps == before


def test_canary_fast_window_keeps_staging(monkeypatch):
    """A fast canary (CPU device_put is instant) leaves staging active and
    records the measured rate."""
    assert staging.active()
    assert staging._canary_mbps is not None and staging._canary_mbps > 0
    assert staging.stage({"x": np.zeros(4, np.float32)}) is not None


def test_canary_opt_out(monkeypatch):
    """EVREAL_PRESTAGE_CANARY=0 skips the probe entirely: staging trusts
    the window (the pre-2026-08-19 behavior)."""
    monkeypatch.setenv("EVREAL_PRESTAGE_CANARY", "0")
    monkeypatch.setattr(staging, "_CANARY_BUDGET_S", 0.0)
    assert staging.active()
    assert staging._canary_mbps is None
