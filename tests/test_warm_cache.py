"""tools/warm_cache.py: AOT pre-warming must write persistent-cache entries
that later processes (the real CLI's jit path) hit, and must dedupe
signatures across eval configs (sweep conditions share capacity buckets by
design, VERDICT r04 item 5)."""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "tools"))
from make_synthetic_sequence import make_sequence  # noqa: E402
from oracle import ref_module  # noqa: E402

SMALL = {"num_bins": 5, "base_num_channels": 8, "num_encoders": 2,
         "num_residual_blocks": 1, "num_output_channels": 1,
         "skip_type": "sum", "norm": None, "use_upsample_conv": False,
         "kernel_size": 3, "channel_multiplier": 2,
         "recurrent_block_type": "convlstm", "final_activation": "sigmoid"}


def _run(args, cwd, cache_dir, timeout=420):
    env = dict(os.environ)
    env.update({"PYTHONPATH": _REPO, "JAX_PLATFORMS": "cpu",
                "JAX_COMPILATION_CACHE_DIR": cache_dir,
                "EVREAL_CACHE_MIN_COMPILE_S": "0",
                "EVREAL_SCAN_UNROLL": "1"})
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "warm_cache.py"),
         *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_warm_cache_cli_dedupes_and_is_hit_on_rerun(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import torch

    torch.manual_seed(0)
    mm = ref_module("model.model")
    m = mm.E2VIDRecurrent(dict(SMALL))
    os.makedirs("pretrained/E2VID", exist_ok=True)
    torch.save({"model": dict(SMALL), "state_dict": m.state_dict()},
               "pretrained/E2VID/model.pth")
    os.makedirs("config/method", exist_ok=True)
    os.makedirs("config/dataset", exist_ok=True)
    with open("config/method/E2VID.json", "w", encoding="utf-8") as f:
        json.dump({"model_name": "E2VID",
                   "model_path": str(tmp_path / "pretrained/E2VID/model.pth"),
                   "event_tensor_normalization": True,
                   "post_process_norm": "robust"}, f)
    for i in range(2):  # 2 same-resolution sequences -> the batched path
        make_sequence(str(tmp_path / "data" / "SYN" / f"seq{i}"), height=32,
                      width=48, duration_s=0.4, fps=15, events_per_frame=300,
                      seed=20 + i)
    with open("config/dataset/SYN.json", "w", encoding="utf-8") as f:
        json.dump({"root_path": "data/SYN",
                   "sequences": {"seq0": {}, "seq1": {}}}, f)

    cache = str(tmp_path / "cache")
    # the same eval config twice: identical signatures must dedupe to ONE
    # compiled program
    out = _run(["-m", "E2VID", "-c", "std", "std", "-d", "SYN"],
               str(tmp_path), cache)
    assert len(out["programs"]) == 1, out
    assert out["programs"][0]["new_cache_entries"] >= 1, out
    assert out["cache_population"] >= 1

    # a fresh process AOT-compiling the same program must hit the
    # persistent cache: zero new entries (the real CLI's jit compile uses
    # the same cache key)
    out2 = _run(["-m", "E2VID", "-c", "std", "-d", "SYN"],
                str(tmp_path), cache)
    assert len(out2["programs"]) == 1
    assert out2["programs"][0]["new_cache_entries"] == 0, out2
    assert out2["cache_population"] == out["cache_population"]

    # a second dataset at a DIFFERENT resolution but the same capacity
    # bucket and group width is a distinct compiled program — the dedup
    # signature must not collide on buffer shapes alone (compact wires
    # are resolution-independent)
    for i in range(2):
        make_sequence(str(tmp_path / "data" / "SYN2" / f"seq{i}"),
                      height=24, width=40, duration_s=0.4, fps=15,
                      events_per_frame=300, seed=30 + i)
    with open("config/dataset/SYN2.json", "w", encoding="utf-8") as f:
        json.dump({"root_path": "data/SYN2",
                   "sequences": {"seq0": {}, "seq1": {}}}, f)
    out3 = _run(["-m", "E2VID", "-c", "std", "-d", "SYN", "SYN2"],
                str(tmp_path), cache)
    assert len(out3["programs"]) == 2, out3
    by_label = {p["program"]: p for p in out3["programs"]}
    syn2 = next(p for label, p in by_label.items() if "SYN2" in label)
    assert syn2["new_cache_entries"] >= 1, out3
