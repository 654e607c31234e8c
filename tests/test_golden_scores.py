"""Full-chain golden-score tests: the REAL CLI (eval.py argv surface ->
config resolution -> MethodBundle checkpoint conversion -> dataset assembly
-> windowing -> packing -> voxelize -> scan model -> gating -> post-norm ->
metrics -> output files) on the deterministic synthetic sequence with the
shipped FireNet+ checkpoint, asserted against goldens produced once by the
reference torch pipeline (tests/gen_golden_scores.py) — for both the
between_frames (`std`) and t_seconds (`t50ms`) windowing modes. Any
numeric drift in any stage fails here. Reference chain: eval.py:189-246 +
eval_metrics.py:244-273."""

import json
import os
import shutil
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")
from make_synthetic_sequence import make_sequence  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


@pytest.mark.slow
@pytest.mark.parametrize("golden_name", ["firenet_plus_syn",
                                         "firenet_plus_syn_t50ms",
                                         "firenet_plus_syn_k3k",
                                         "firenet_legacy_syn"])
def test_cli_matches_reference_goldens(golden_name, tmp_path, monkeypatch,
                                       capsys):
    with open(os.path.join(HERE, "goldens", golden_name + ".json"),
              encoding="utf-8") as f:
        golden = json.load(f)
    sc = golden["scenario"]
    cfg_name = sc["eval_config"]

    monkeypatch.chdir(tmp_path)
    make_sequence(str(tmp_path / "data" / "SYN" / "seq0"), **sc["sequence"])
    (tmp_path / "config" / "dataset").mkdir(parents=True)
    (tmp_path / "config" / "dataset" / "SYN.json").write_text(json.dumps({
        "root_path": "data/SYN",
        "sequences": {"seq0": {"start_time_s": sc["start_s"],
                               "end_time_s": sc["end_s"]}},
    }))
    from evreal_tpu.harness.config import get_eval_configs

    if cfg_name.endswith("_golden"):
        # scenario-specific eval config (the k_events golden widens
        # ts_tol_ms — see gen_golden_scores.SCENARIOS): written into the
        # CWD config tree, which the resolver searches first, exercising
        # the same user-supplied-config path as a real deployment
        (tmp_path / "config" / "eval").mkdir(parents=True)
        (tmp_path / "config" / "eval" / (cfg_name + ".json")).write_text(
            json.dumps({
                "dataset_kwargs": {"num_bins": 5,
                                   "voxel_method": sc["voxel_method"],
                                   "keep_ratio": 1.0},
                "save_images": False, "histeq": "none",
                "eval_infer_all": False, "ts_tol_ms": sc["ts_tol_ms"],
                "create_video": False,
            }))
    # the resolved eval config must carry the golden scenario's windowing
    # and gating — assert instead of assuming
    (ec,) = get_eval_configs([cfg_name])
    assert ec["ts_tol_ms"] == sc["ts_tol_ms"]
    want_vm = sc["voxel_method"] or {"method": "between_frames"}
    assert ec["dataset_kwargs"]["voxel_method"] == want_vm

    method = sc.get("method", "FireNet+")
    ckpt_dir = tmp_path / "pretrained" / method
    ckpt_dir.mkdir(parents=True)
    shutil.copy(f"/root/reference/pretrained/{method}/model.pth",
                ckpt_dir / "model.pth")

    from evreal_tpu.cli import eval_main

    eval_main(["-m", method, "-c", cfg_name, "-d", "SYN",
               "-qm", "mse", "ssim"])
    out = capsys.readouterr().out
    assert method in out

    out_dir = tmp_path / "outputs" / cfg_name / "SYN" / "seq0" / method
    ts_rows = [l.split() for l in
               (out_dir / "timestamps.txt").read_text().splitlines()]
    mse_rows = [l.split() for l in
                (out_dir / "mse.txt").read_text().splitlines()]
    ssim_rows = [l.split() for l in
                 (out_dir / "ssim.txt").read_text().splitlines()]
    rows = golden["rows"]
    assert len(mse_rows) == len(rows), (len(mse_rows), len(rows))
    assert len(ssim_rows) == len(rows)

    # timestamps.txt spans every processed frame; golden rows are the
    # quantitatively evaluated subset — match on idx
    ts_by_idx = {int(i): float(t) for i, t in ts_rows}
    for g, mrow, srow in zip(rows, mse_rows, ssim_rows):
        assert int(mrow[0]) == g["idx"]
        assert int(srow[0]) == g["idx"]
        assert abs(ts_by_idx[g["idx"]] - g["ts"]) < 1e-9, g
        assert abs(float(mrow[1]) - g["mse"]) < 2e-4, (mrow, g)
        assert abs(float(srow[1]) - g["ssim"]) < 2e-3, (srow, g)

    mean_mse = np.mean([g["mse"] for g in rows])
    got_mse = np.mean([float(r[1]) for r in mse_rows])
    assert abs(got_mse - mean_mse) < 1e-4
