#!/usr/bin/env python
"""Generate tests/goldens/*.json — full-chain goldens: per-frame
(idx, timestamp, mse, ssim) of the reference torch pipeline (MemMapDataset
windowing + torch FireNet+ with the shipped checkpoint + CropParameters
pad/crop + clip + skimage-semantics mse/ssim; reference eval.py:189-246 +
eval_metrics.py:244-273) on the deterministic synthetic sequence, for two
windowing modes (the shipped `std` and `t50ms` eval configs).
tests/test_golden_scores.py replays the SAME sequence through the real CLI
and asserts the output files against these records, locking
windowing+packing+voxelize+model+gating+post-norm+metric numerics together.

Run from the repo root (the outputs are checked in; regenerate only if a
golden scenario itself changes):

    python -m tests.gen_golden_scores
"""

import json
import os
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# the golden scenarios — shared verbatim with test_golden_scores.py
SEQ_KW = {"height": 48, "width": 64, "duration_s": 1.0, "fps": 20,
          "events_per_frame": 1200, "seed": 11}
START_S, END_S = 0.1, 0.8
# (name, eval_config, voxel_method, ts_tol_ms, method). The k_events
# scenario uses a widened tolerance (the test writes the matching eval
# config into its CWD): k-window boundaries land on event timestamps,
# which are almost never within the shipped 1 ms of a 20 fps frame grid —
# the shipped k configs would gate out every frame of the synthetic
# sequence and the golden would lock nothing. The FireNet (legacy)
# scenario locks the other real shipped checkpoint, its
# ``ckpt['config']['model']`` loading schema AND the input event-tensor
# normalization its method config enables (eval.py:222-223, 398-410) —
# a path the FireNet+ goldens never exercise.
SCENARIOS = [
    ("firenet_plus_syn", "std", None, 1.0, "FireNet+"),
    ("firenet_plus_syn_t50ms", "t50ms",
     {"method": "t_seconds", "t": 0.05, "sliding_window_t": 0}, 1.0,
     "FireNet+"),
    ("firenet_plus_syn_k3k", "k3k_golden",
     {"method": "k_events", "k": 3000, "sliding_window_w": 0}, 30.0,
     "FireNet+"),
    ("firenet_legacy_syn", "std", None, 1.0, "FireNet"),
]


def main():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    sys.path.insert(0, REPO)
    from make_synthetic_sequence import make_sequence

    from tests.test_end_to_end import reference_pipeline

    with tempfile.TemporaryDirectory() as d:
        seq_dir = os.path.join(d, "seq0")
        make_sequence(seq_dir, **SEQ_KW)
        for name, eval_cfg, voxel_method, ts_tol_ms, method in SCENARIOS:
            rows = reference_pipeline(seq_dir, START_S, END_S,
                                      ts_tol_ms=ts_tol_ms,
                                      voxel_method=voxel_method,
                                      method=method)
            assert rows, f"scenario {name} produced no evaluated frames"
            out = {
                "scenario": {"sequence": SEQ_KW, "start_s": START_S,
                             "end_s": END_S, "ts_tol_ms": ts_tol_ms,
                             "eval_config": eval_cfg,
                             "voxel_method": voxel_method,
                             "method": method,
                             "checkpoint":
                                 f"/root/reference/pretrained/{method}"},
                "rows": [{"idx": idx, "ts": ts, "mse": mse, "ssim": ssim}
                         for idx, ts, mse, ssim in rows],
            }
            path = os.path.join(HERE, "goldens", name + ".json")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w", encoding="utf-8") as f:
                json.dump(out, f, indent=1)
            print(f"wrote {path}: {len(rows)} golden rows")


if __name__ == "__main__":
    main()
