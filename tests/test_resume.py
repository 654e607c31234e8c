"""EVREAL_RESUME: finished (config, dataset, sequence, method) outputs —
marked by the done.json record finalize writes — are skipped on rerun and
their recorded scores reused; a fresh run without the flag invalidates the
record first. Capability extension: the reference truncates all outputs on
every run (eval_metrics.py:315-324)."""

import json
import sys

import pytest

sys.path.insert(0, "/root/repo/tools")
from make_synthetic_sequence import make_sequence  # noqa: E402

from evreal_tpu.data import Sequence
from evreal_tpu.harness.batched import eval_method_on_sequence_group
from evreal_tpu.harness.runner import eval_method_on_sequence

from .test_batched_eval import EVAL_CONFIG, METHOD_CONFIG
from .test_end_to_end import FakeBundle


@pytest.fixture(scope="module")
def seq_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    dirs = []
    for i in range(2):
        d = root / f"seq{i}"
        make_sequence(str(d), height=48, width=64, duration_s=0.8, fps=20,
                      events_per_frame=800, seed=60 + i)
        dirs.append(str(d))
    return dirs


def _sequences(seq_dirs):
    out = []
    for i, d in enumerate(seq_dirs):
        seq = Sequence(d, num_bins=5,
                       voxel_method={"method": "between_frames"})
        out.append({"name": f"seq{i}", "dataset": seq,
                    "start_time_s": 0.1, "end_time_s": 10.0})
    return out


def test_single_sequence_resume(seq_dirs, tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    bundle = FakeBundle("FireNet+")
    seq = _sequences(seq_dirs)[0]
    args = ("SYNS", EVAL_CONFIG, "FireNet+", bundle, METHOD_CONFIG, seq,
            ["mse", "ssim"])

    first = eval_method_on_sequence(*args)
    out_dir = tmp_path / "outputs/std/SYNS/seq0/FireNet+"
    done = json.loads((out_dir / "done.json").read_text())
    assert done["num_evaluated"] == first[0]
    ts_before = (out_dir / "timestamps.txt").read_text()

    monkeypatch.setenv("EVREAL_RESUME", "1")
    capsys.readouterr()
    second = eval_method_on_sequence(*args)
    assert "Skipping finished" in capsys.readouterr().out
    assert second[0] == first[0]
    assert second[1] == pytest.approx(first[1])
    # untouched: the run really was skipped
    assert (out_dir / "timestamps.txt").read_text() == ts_before

    # a narrower metric request is covered by the record, reported narrowly
    assert eval_method_on_sequence(
        "SYNS", EVAL_CONFIG, "FireNet+", bundle, METHOD_CONFIG, seq,
        ["mse"]) == (first[0], {"mse": first[1]["mse"]})

    # a metric the record doesn't cover forces a real (skipped-nothing) run
    capsys.readouterr()
    third = eval_method_on_sequence(
        "SYNS", EVAL_CONFIG, "FireNet+", bundle, METHOD_CONFIG, seq,
        ["mse", "ssim", "nonexistent_metric"])
    # unknown metric resolves away -> expected set == {mse, ssim}: skipped
    assert "Skipping finished" in capsys.readouterr().out
    assert third[0] == first[0]


def test_fresh_run_invalidates_record(seq_dirs, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    bundle = FakeBundle("FireNet+")
    seq = _sequences(seq_dirs)[0]
    args = ("SYNS", EVAL_CONFIG, "FireNet+", bundle, METHOD_CONFIG, seq,
            ["mse"])
    eval_method_on_sequence(*args)
    out_dir = tmp_path / "outputs/std/SYNS/seq0/FireNet+"
    assert (out_dir / "done.json").exists()
    # without EVREAL_RESUME a rerun truncates and rewrites the record
    monkeypatch.delenv("EVREAL_RESUME", raising=False)
    eval_method_on_sequence(*args)
    assert (out_dir / "done.json").exists()


def test_group_partial_resume(seq_dirs, tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    bundle = FakeBundle("FireNet+")

    full = eval_method_on_sequence_group(
        "SYNS", EVAL_CONFIG, "FireNet+", bundle, METHOD_CONFIG,
        _sequences(seq_dirs), ["mse", "ssim"])
    # invalidate seq1's record: only seq0 should be skipped on resume
    done1 = tmp_path / "outputs/std/SYNS/seq1/FireNet+/done.json"
    done1.unlink()

    monkeypatch.setenv("EVREAL_RESUME", "1")
    capsys.readouterr()
    again = eval_method_on_sequence_group(
        "SYNS", EVAL_CONFIG, "FireNet+", bundle, METHOD_CONFIG,
        _sequences(seq_dirs), ["mse", "ssim"])
    out = capsys.readouterr().out
    assert "seq0" in out and "Skipping finished" in out
    assert "seq1" not in out.split("Skipping finished")[-1].split("\n")[0]
    assert len(again) == 2
    for (n0, s0), (n1, s1) in zip(full, again):
        assert n0 == n1
        for k in s0:
            assert s0[k] == pytest.approx(s1[k], abs=1e-6)
    assert done1.exists()  # seq1 re-ran and re-recorded

    # all finished -> whole group skipped
    capsys.readouterr()
    third = eval_method_on_sequence_group(
        "SYNS", EVAL_CONFIG, "FireNet+", bundle, METHOD_CONFIG,
        _sequences(seq_dirs), ["mse", "ssim"])
    assert capsys.readouterr().out.count("Skipping finished") == 2
    assert [n for n, _ in third] == [n for n, _ in full]


def test_changed_settings_invalidate_resume(seq_dirs, tmp_path, monkeypatch,
                                            capsys):
    """A rerun with different output-affecting settings (save_images newly
    on) must re-run, not skip — its PNGs were never produced."""
    monkeypatch.chdir(tmp_path)
    bundle = FakeBundle("FireNet+")
    seq = _sequences(seq_dirs)[0]
    cfg_off = dict(EVAL_CONFIG, save_images=False)
    eval_method_on_sequence("SYNS", cfg_off, "FireNet+", bundle,
                            METHOD_CONFIG, seq, ["mse"])
    monkeypatch.setenv("EVREAL_RESUME", "1")
    cfg_on = dict(EVAL_CONFIG, save_images=True)
    capsys.readouterr()
    eval_method_on_sequence("SYNS", cfg_on, "FireNet+", bundle,
                            METHOD_CONFIG, seq, ["mse"])
    assert "Skipping finished" not in capsys.readouterr().out
    out_dir = tmp_path / "outputs/std/SYNS/seq0/FireNet+"
    assert list(out_dir.glob("frame_*.png"))  # images really were produced
    # now the record matches the new settings: a rerun does skip
    capsys.readouterr()
    eval_method_on_sequence("SYNS", cfg_on, "FireNet+", bundle,
                            METHOD_CONFIG, seq, ["mse"])
    assert "Skipping finished" in capsys.readouterr().out


def test_changed_eval_window_invalidates_resume(seq_dirs, tmp_path,
                                                monkeypatch, capsys):
    """The quantitative-eval time window is as score-affecting as
    ts_tol_ms but lives on the sequence (dataset config), not the eval
    config — editing start/end_time_s must re-run, not reuse stale scores
    (review finding: it silently skipped)."""
    monkeypatch.chdir(tmp_path)
    bundle = FakeBundle("FireNet+")
    seq = _sequences(seq_dirs)[0]
    eval_method_on_sequence("SYNW", EVAL_CONFIG, "FireNet+", bundle,
                            METHOD_CONFIG, seq, ["mse"])
    monkeypatch.setenv("EVREAL_RESUME", "1")
    cut = dict(seq, start_time_s=seq["start_time_s"] + 0.1)
    capsys.readouterr()
    n_cut, _ = eval_method_on_sequence("SYNW", EVAL_CONFIG, "FireNet+",
                                       bundle, METHOD_CONFIG, cut, ["mse"])
    assert "Skipping finished" not in capsys.readouterr().out
    # same window again: now it does skip, reusing the cut-window record
    capsys.readouterr()
    n_again, _ = eval_method_on_sequence("SYNW", EVAL_CONFIG, "FireNet+",
                                        bundle, METHOD_CONFIG, cut, ["mse"])
    assert "Skipping finished" in capsys.readouterr().out
    assert n_again == n_cut
