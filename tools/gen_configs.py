#!/usr/bin/env python
"""Generate the config tree (config/{eval,method,dataset}/*.json).

The schemas and values replicate the reference benchmark definitions
(EVREAL config/, see SURVEY.md §2e) so that the CLI, sweep families and
dataset evaluation windows are drop-in compatible. Configs are emitted
programmatically rather than stored as 56 hand-maintained files.
"""

import json
import os

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                    "config")


def _eval_cfg(voxel_method, save_images=True, histeq="none",
              eval_infer_all=False, ts_tol_ms=1.0, create_video=False,
              keep_ratio=1.0, color=None):
    cfg = {
        "dataset_kwargs": {
            "num_bins": 5,
            "voxel_method": voxel_method,
            "keep_ratio": keep_ratio,
        },
        "save_images": save_images,
        "histeq": histeq,
    }
    if color is not None:
        cfg["color"] = color
    cfg.update({
        "eval_infer_all": eval_infer_all,
        "ts_tol_ms": ts_tol_ms,
        "create_video": create_video,
    })
    return cfg


def eval_configs():
    bf = {"method": "between_frames"}
    out = {
        "std": _eval_cfg(bf),
        "std_all": _eval_cfg(bf, eval_infer_all=True),
        "color": _eval_cfg(bf, color=True),
    }
    for ms in range(10, 101, 10):
        # reference saves images only for t40ms (HDR table) and t60ms
        # (NCaltech101 reconstructions), config/eval/t*.json
        out[f"t{ms}ms"] = _eval_cfg(
            {"method": "t_seconds", "t": ms / 1000, "sliding_window_t": 0},
            save_images=ms in (40, 60))
    for k in range(5, 46, 5):
        out[f"k{k}k"] = _eval_cfg(
            {"method": "k_events", "k": k * 1000, "sliding_window_w": 0},
            save_images=False)
    for kr in range(1, 11):
        out[f"kr{kr / 10:.1f}"] = _eval_cfg(bf, save_images=False,
                                            keep_ratio=kr / 10)
    return out


def method_configs():
    norm_on = {"E2VID", "FireNet"}
    post = {"E2VID": "robust", "SSL-E2VID": "exprobust"}
    methods = ["E2VID", "E2VID+", "FireNet", "FireNet+", "SPADE-E2VID",
               "SSL-E2VID", "ET-Net", "HyperE2VID"]
    return {
        m: {
            "model_name": m,
            # reference path; the loader auto-converts .pth -> .npz on
            # first use (harness/runner.py load_method_params)
            "model_path": f"pretrained/{m}/model.pth",
            "event_tensor_normalization": m in norm_on,
            "post_process_norm": post.get(m, "none"),
        }
        for m in methods
    }


def dataset_configs():
    ecd_windows = {
        "calibration": (5.0, 20.0), "boxes_6dof": (5.0, 20.0),
        "dynamic_6dof": (5.0, 20.0), "office_zigzag": (5.0, 12.0),
        "poster_6dof": (5.0, 20.0), "shapes_6dof": (5.0, 20.0),
        "slider_depth": (1.0, 2.5),
    }
    mvsec_windows = {
        "indoor_flying1_data": (10.0, 70.0), "indoor_flying2_data": (10.0, 70.0),
        "indoor_flying3_data": (10.0, 70.0), "indoor_flying4_data": (10.0, 19.8),
        "outdoor_day1_data": (0.0, 60.0), "outdoor_day2_data": (100.0, 160.0),
    }
    fpvdr_ends = {
        "indoor_forward_3_davis_with_gt": 54, "indoor_forward_5_davis_with_gt": 50,
        "indoor_forward_6_davis_with_gt": 32, "indoor_forward_7_davis_with_gt": 73,
        "indoor_forward_8_davis": 132, "indoor_forward_9_davis_with_gt": 34,
        "indoor_forward_10_davis_with_gt": 33, "indoor_forward_11_davis": 24,
        "indoor_forward_12_davis": 31, "indoor_45_1_davis": 73,
        "indoor_45_2_davis_with_gt": 55, "indoor_45_3_davis": 57,
        "indoor_45_4_davis_with_gt": 47, "indoor_45_9_davis_with_gt": 40,
        "indoor_45_11_davis": 22, "indoor_45_12_davis_with_gt": 51,
        "indoor_45_13_davis_with_gt": 42, "indoor_45_14_davis_with_gt": 43,
        "indoor_45_16_davis": 15, "outdoor_forward_1_davis_with_gt": 49,
        "outdoor_forward_2_davis": 36, "outdoor_forward_3_davis_with_gt": 92,
        "outdoor_forward_5_davis_with_gt": 22, "outdoor_forward_6_davis": 34,
        "outdoor_forward_9_davis": 43, "outdoor_forward_10_davis": 59,
    }
    bs_ergb = ["may29_handheld_01", "may29_handheld_02", "may29_handheld_03",
               "may29_handheld_04", "may29_rooftop_handheld_01",
               "may29_rooftop_handheld_02", "may29_rooftop_handheld_03",
               "may29_rooftop_handheld_05", "street_crossing_07",
               "street_crossing_08"]

    def windows(d):
        return {k: {"start_time_s": a, "end_time_s": b}
                for k, (a, b) in d.items()}

    return {
        "ECD": {"root_path": "data/ECD", "sequences": windows(ecd_windows)},
        "ECD_fast": {"root_path": "data/ECD", "sequences": {
            s: {"start_time_s": 20.0} for s in
            ["calibration", "boxes_6dof", "dynamic_6dof", "poster_6dof",
             "shapes_6dof"]}},
        "ECD_calib": {"root_path": "data/ECD",
                      "sequences": {"calibration": {}}},
        "MVSEC": {"root_path": "data/MVSEC",
                  "sequences": windows(mvsec_windows)},
        "MVSEC_night": {"root_path": "data/MVSEC", "sequences": {
            f"outdoor_night{i}_data": {} for i in (1, 2, 3)}},
        "MVSEC_night_1": {"root_path": "data/MVSEC",
                          "sequences": {"outdoor_night1_data": {}}},
        "HQF": {"root_path": "data/HQF", "get_all_sequences": True},
        "CED": {"root_path": "data/CED", "get_all_sequences": True},
        "NCaltech101": {"root_path": "data/NCaltech101",
                        "has_subfolders": True, "get_all_sequences": True},
        "TPAMI20_HDR": {"root_path": "data/TPAMI20", "sequences": {
            s: {} for s in ["hdr_selfie", "hdr_sun", "hdr_tunnel"]}},
        "BS_ERGB_handheld": {"root_path": "data/BS_ERGB",
                             "sequences": {s: {} for s in bs_ergb}},
        "FPVDR": {"root_path": "data/FPVDR", "sequences": {
            k: {"start_time_s": 10.0, "end_time_s": float(v)}
            for k, v in fpvdr_ends.items()}},
    }


def main(root=ROOT):
    groups = {"eval": eval_configs(), "method": method_configs(),
              "dataset": dataset_configs()}
    for group, cfgs in groups.items():
        d = os.path.join(root, group)
        os.makedirs(d, exist_ok=True)
        for name, cfg in cfgs.items():
            with open(os.path.join(d, name + ".json"), "w",
                      encoding="utf-8") as f:
                json.dump(cfg, f, indent=2)
    total = sum(len(v) for v in groups.values())
    print(f"wrote {total} configs under {os.path.abspath(root)}")


if __name__ == "__main__":
    main()
