"""Downstream scoring logic tests (hand-computed expectations)."""

import importlib.util
import os

import pytest
import sys


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
voc = _load(os.path.join(REPO, "downstream/detection/pascal_voc_map.py"),
            "voc_map_mod")


def test_voc_ap_hand_computed():
    gts = [("car", [0, 0, 10, 10]), ("car", [20, 20, 30, 30])]
    preds = [("car", 0.9, [0, 0, 10, 10]),
             ("car", 0.8, [50, 50, 60, 60]),
             ("car", 0.7, [20, 20, 30, 30])]
    # TP(r=.5,p=1), FP(r=.5,p=.5), TP(r=1,p=2/3) -> AP = .5*1 + .5*(2/3)
    ap = voc.voc_ap(gts, preds)
    assert abs(ap - (0.5 + 0.5 * 2 / 3)) < 1e-9


def test_voc_ap_partial_overlap_below_threshold():
    gts = [("car", [0, 0, 10, 10])]
    preds = [("car", 0.9, [8, 8, 18, 18])]  # IoU ~ 0.0256 < 0.5 -> FP
    assert voc.voc_ap(gts, preds) == 0.0


def test_calculate_map(tmp_path):
    gt = tmp_path / "gt"
    pred = tmp_path / "pred"
    gt.mkdir()
    pred.mkdir()
    (gt / "f1.txt").write_text("car 0 0 10 10\n")
    (pred / "f1.txt").write_text("car 0.9 0 0 10 10\n")
    (gt / "f2.txt").write_text("car 0 0 10 10\n")
    (pred / "f2.txt").write_text("car 0.9 50 50 60 60\n")
    assert abs(voc.calculate_map(str(gt), str(pred)) - 0.5) < 1e-9


def test_shipped_annotations_score(tmp_path):
    """The vendored MVSEC outdoor_night1 annotations (reference
    downstream_tasks/detection/: frame_list.txt + 368 label files — human
    annotation data) make detection scoring run without a second EVREAL
    checkout: GT-as-prediction scores mAP 1.0 on every labeled frame."""
    labels = voc.SHIPPED_LABELS
    assert os.path.isdir(labels)
    names = sorted(os.listdir(labels))
    assert len(names) == 368
    frame_list = os.path.join(os.path.dirname(labels), "frame_list.txt")
    frames = [l.strip() for l in open(frame_list, encoding="utf-8")
              if l.strip()]
    assert len(frames) == 400
    # every label file's frame id is in frame_list
    ids = {n[len("frame_"):-len(".txt")] for n in names}
    assert ids <= set(frames)

    pred = tmp_path / "pred"
    pred.mkdir()
    for n in names:
        rows = []
        with open(os.path.join(labels, n), encoding="utf-8") as f:
            for line in f:
                parts = line.split()
                if parts:
                    rows.append(f"{parts[0]} 0.99 {' '.join(parts[1:])}")
        (pred / n).write_text("\n".join(rows) + "\n")
    assert abs(voc.calculate_map(labels, str(pred)) - 1.0) < 1e-9


def test_get_mape(tmp_path, monkeypatch, capsys):
    mape = _load(os.path.join(REPO, "downstream/calibration/get_mape.py"),
                 "mape_mod")
    d = tmp_path / "calibdir_E2VID" / "iter1"
    d.mkdir(parents=True)
    lines = [""] * 5
    lines.append("    distortion: [-0.3 0.15 0.0 0.0] +- [0 0 0 0]")
    lines.append("    projection: [200.0 199.0 132.0 110.0] +- [0 0 0 0]")
    (d / "results-cam-calibreconstruction.txt").write_text("\n".join(lines))
    (tmp_path / "gt_calib_params.txt").write_text(
        "200.0 200.0 132.0 110.0 -0.3 0.15 0 0 0\n")
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", ["get_mape.py"])
    mape.main()
    out = capsys.readouterr().out
    # only fy is off: |200-199|/200 = 0.5% -> MAPE = 0.5/6 %
    assert "E2VID MAPE:" in out
    val = float(out.split("MAPE:")[-1].strip().rstrip("%"))
    assert abs(val - 100 * (1 / 200) / 6) < 0.01


def test_classifier_accuracy_accounting(tmp_path):
    import sys

    sys.path.insert(0, os.path.join(REPO, "downstream", "classification"))
    from classifier import evaluate_outputs

    classes = ["cat", "dog", "fish"]
    # model A: 2/3 correct on cat+dog; model B: 1/2 correct
    layout = {"A": {"cat": ["i1.png", "i2.png"], "dog": ["i3.png"]},
              "B": {"fish": ["i4.png"], "cat": ["i5.png"]}}
    truth = {"i1.png": 0, "i2.png": 1, "i3.png": 1,
             "i4.png": 2, "i5.png": 1}
    for model, by_class in layout.items():
        for cls, files in by_class.items():
            d = tmp_path / model / cls
            d.mkdir(parents=True)
            for f in files:
                (d / f).write_bytes(b"")
    predict = lambda p: truth[os.path.basename(p)]
    res = evaluate_outputs(predict, str(tmp_path), classes)
    assert res["A"] == pytest.approx(100 * 2 / 3)
    assert res["B"] == pytest.approx(50.0)
