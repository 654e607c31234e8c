"""train_cli smoke test: run, checkpoint, resume — the resumed run must pick
up the saved step and produce the same final params as an uninterrupted run
(orbax job checkpointing; the reference has no training or job resume).

Runs main() in-process so the three runs share one jit cache."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "tools"))
from make_synthetic_sequence import make_sequence  # noqa: E402

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, REPO)


def _run(args, monkeypatch, capsys):
    import train_cli

    monkeypatch.setattr(sys, "argv", ["train_cli.py"] + args)
    train_cli.main()
    return capsys.readouterr().out


def test_train_checkpoint_resume(tmp_path, monkeypatch, capsys):
    data = tmp_path / "data"
    make_sequence(str(data / "seq0"), height=16, width=16, duration_s=1.0,
                  fps=24, events_per_frame=150, seed=0)

    common = ["--data", str(data), "--arch", "firenet", "--batch", "2",
              "--chunk-t", "4", "--log-every", "1", "--seed", "3"]

    # uninterrupted 4-step run
    _run(common + ["--steps", "4", "--out", str(tmp_path / "full")],
         monkeypatch, capsys)
    full = dict(np.load(tmp_path / "full" / "model.npz"))

    # 2 steps with checkpointing, then resume to 4
    out = str(tmp_path / "resumed")
    _run(common + ["--steps", "2", "--save-every", "1", "--out", out],
         monkeypatch, capsys)
    stdout = _run(common + ["--steps", "4", "--save-every", "1", "--resume",
                            "--out", out], monkeypatch, capsys)
    assert "resumed from step 2" in stdout, stdout
    resumed = dict(np.load(os.path.join(out, "model.npz")))

    assert full.keys() == resumed.keys()
    for k in full:
        np.testing.assert_allclose(resumed[k], full[k], atol=1e-5,
                                   err_msg=k)

    # the trained checkpoint must reload through the eval CLI's loader
    # (meta sidecar written by save_params) and run a forward pass
    from evreal_tpu.harness.runner import load_method_params
    from evreal_tpu.models import build_from_meta

    params, meta = load_method_params(
        {"model_name": "FireNet",
         "model_path": str(tmp_path / "full" / "model.npz")})
    assert meta["class"] == "FireNet" and meta["num_encoders"] == 0
    model = build_from_meta(meta)
    state = model.init_state(1, 16, 16)
    out, _ = model.apply(params, state, np.zeros((1, 16, 16, 5),
                                                 np.float32))
    assert np.isfinite(np.asarray(out["image"])).all()
