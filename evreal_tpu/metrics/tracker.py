"""Score tracking and per-sequence output orchestration.

``EvalMetricsTracker`` mirrors the reference class of the same name
(utils/eval_metrics.py:162-350): output tree layout, txt formats, clipping,
PNG saving, hist-eq'd processed copies, quantitative gating on the eval time
window and img<->ref timestamp tolerance, NaN/inf score dropping, and
count-weighted aggregation via ``MetricTracker`` (eval.py:249-276).

Metric *values* are computed on device by the runner and passed in; the
batch-of-4 GPU queue of the reference's pyiqa path is unnecessary (scores are
identical, throughput comes from whole-chunk batching instead).
"""

import math
import os
import shutil

from evreal_tpu.harness.outputs import (
    AsyncImageWriter,
    ensure_dir,
    truncate,
)

import numpy as np


def resume_enabled():
    """EVREAL_RESUME=1: finished (config, dataset, sequence, method) output
    dirs — marked by the done.json record finalize writes — are skipped and
    their recorded scores reused. A capability the reference lacks (it
    truncates all outputs on every run, eval_metrics.py:315-324)."""
    return os.environ.get("EVREAL_RESUME", "0").lower() in ("1", "true",
                                                            "yes")


def resume_settings(eval_config):
    """The output-affecting eval-config subset recorded in done.json: a
    rerun whose settings differ (e.g. save_images newly on) must re-run,
    not skip — its PNGs/videos were never produced."""
    return {"save_images": eval_config.get("save_images", True),
            "histeq": eval_config.get("histeq", "none"),
            "create_video": eval_config.get("create_video", False),
            "eval_infer_all": eval_config.get("eval_infer_all", False),
            "color": eval_config.get("color", False),
            "ts_tol_ms": eval_config.get("ts_tol_ms", float("inf"))}


def sequence_settings(settings, sequence):
    """Per-sequence completion-guard settings: the quantitative-eval time
    window is as score-affecting as ts_tol_ms but lives on the SEQUENCE
    (dataset-config cut or data-derived defaults), not the eval config —
    without it a rerun after editing start_time_s/end_time_s would reuse
    scores computed under the old cut."""
    return {**settings,
            "start_time_s": sequence.get("start_time_s"),
            "end_time_s": sequence.get("end_time_s")}


def load_completed(output_dir, expected_metrics, settings=None):
    """(num_evaluated, mean_scores) from a prior finished run covering
    ``expected_metrics`` under the same output-affecting ``settings``,
    else None."""
    import json

    try:
        with open(os.path.join(output_dir, "done.json"),
                  encoding="utf-8") as f:
            data = json.load(f)
        if not set(expected_metrics) <= set(data["metrics"]):
            return None
        if settings is not None and data.get("settings") != settings:
            return None
        return int(data["num_evaluated"]), {
            m: float(data["mean_scores"][m]) for m in expected_metrics}
    except (OSError, ValueError, KeyError, TypeError):
        return None


class MetricTracker:
    def __init__(self):
        self.data = {}

    def _init_key(self, key):
        self.data[key] = {"total": 0.0, "count": 0, "average": 0.0}

    def update(self, key, value, count=1):
        if count == 0:
            return
        if key not in self.data:
            self._init_key(key)
        d = self.data[key]
        d["total"] += value * count
        d["count"] += count
        d["average"] = d["total"] / d["count"]

    def get_average(self, key):
        if key not in self.data:
            self._init_key(key)
        return self.data[key]["average"]

    def get_count(self, key):
        if key not in self.data:
            self._init_key(key)
        return self.data[key]["count"]

    def keys(self):
        return self.data.keys()


class EvalMetricsTracker:
    def __init__(self, save_images=False, save_processed_images=False,
                 output_dir=None, hist_eq="none", quan_eval_metric_names=None,
                 quan_eval_start_time=0, quan_eval_end_time=float("inf"),
                 quan_eval_ts_tol_ms=float("inf"), has_reference_frames=False,
                 color=False, no_ref_metric_names=(), run_settings=None):
        self.save_images = save_images
        self.save_processed_images = save_processed_images and hist_eq != "none"
        self.output_dir = output_dir
        self.hist_eq = hist_eq
        self.start_time = quan_eval_start_time
        self.end_time = quan_eval_end_time
        self.ts_tol_ms = quan_eval_ts_tol_ms
        self.has_reference_frames = has_reference_frames
        self.color = color
        self.metric_names = list(quan_eval_metric_names or
                                 ["mse", "ssim", "lpips"])
        self.no_ref_names = set(no_ref_metric_names)
        if not has_reference_frames:
            self.metric_names = [m for m in self.metric_names
                                 if m in self.no_ref_names]
        self.only_no_ref = all(m in self.no_ref_names
                               for m in self.metric_names)
        self.run_settings = run_settings
        self.scores = {m: [] for m in self.metric_names}
        self.quan_eval_indices = []
        self._files = {}
        self._setup_outputs()

    # -- files ---------------------------------------------------------------

    def _setup_outputs(self):
        ensure_dir(self.output_dir)
        if self.save_processed_images:
            self.processed_output_dir = self.output_dir + "_processed"
            ensure_dir(self.processed_output_dir)
        # a fresh run invalidates any completion record first, so an
        # interrupted rerun can't leave a stale done.json over truncated txts
        try:
            os.remove(self._done_path())
        except OSError:
            pass
        truncate(self._ts_path())
        for m in self.metric_names:
            truncate(self._metric_path(m))

    def _ts_path(self):
        return os.path.join(self.output_dir, "timestamps.txt")

    def _done_path(self):
        return os.path.join(self.output_dir, "done.json")

    def _metric_path(self, name):
        return os.path.join(self.output_dir, name + ".txt")

    # -- per-frame -----------------------------------------------------------

    def _append(self, path, line):
        """Per-frame incremental appends through persistent line-buffered
        handles (same on-disk behavior as the reference's open-per-append,
        eval_utils.py:57-69, at ~5x less host cost on this 1-core box)."""
        f = self._files.get(path)
        if f is None:
            f = open(path, "a", buffering=1, encoding="utf-8")
            self._files[path] = f
        f.write(line)

    def update(self, idx, img, ref, img_ts, ref_ts=None, scores=None,
               processed_img=None):
        """Record one frame. ``scores``: device-computed metric values for
        this frame (already on clipped+processed images). ``img`` may be
        float (clipped here), uint8 (pre-quantized on device — saved
        as-is), or None (the loop skipped the device->host image fetch
        because nothing would be saved)."""
        if ref_ts is None:
            ref_ts = img_ts
        self._append(self._ts_path(), "{} {:.15f}\n".format(idx, img_ts))

        if img is not None:
            if img.dtype != np.uint8:
                img = np.clip(img, 0.0, 1.0)
            if self.save_images:
                self._writer().submit(self.output_dir, img, idx)
        if self.save_processed_images and processed_img is not None:
            self._writer().submit(self.processed_output_dir, processed_img,
                                  idx)

        inside_cut = self.start_time <= img_ts <= self.end_time
        tol_ok = (abs(ref_ts - img_ts) * 1000 <= self.ts_tol_ms
                  if not self.only_no_ref else True)
        if inside_cut and tol_ok and not self.color and scores is not None:
            self.quan_eval_indices.append(idx)
            for name in self.metric_names:
                if name not in scores:
                    continue
                s = float(scores[name])
                if math.isfinite(s):
                    self.scores[name].append(s)
                    self._append(self._metric_path(name),
                                 "{} {:.5f}\n".format(idx, s))

    def save_custom_metric(self, idx, metric_name, metric_value, is_int=False):
        path = os.path.join(self.output_dir, metric_name + ".txt")
        if idx == 0 or not getattr(self, f"_custom_{metric_name}", False):
            f = self._files.pop(path, None)
            if f is not None:
                f.close()
            truncate(path)
            setattr(self, f"_custom_{metric_name}", True)
        fmt = "{} {}\n" if is_int else "{} {:.5f}\n"
        self._append(path, fmt.format(idx, metric_value))

    # -- aggregation ----------------------------------------------------------

    def _writer(self):
        if getattr(self, "_image_writer", None) is None:
            self._image_writer = AsyncImageWriter()
        return self._image_writer

    def finalize(self, idx, dropped=()):
        """Flush the background PNG writer and close txt handles (the
        reference's finalize flushes its pyiqa batch queues,
        eval_metrics.py:225-228). Exception-safe: txt handles are closed
        even if a PNG write failed; the writer error is re-raised last.

        ``dropped``: metric names the harness's runtime containment
        removed mid-sequence. They are excluded from done.json's
        completion record so an EVREAL_RESUME rerun re-evaluates the
        sequence instead of trusting a partial mean, and from subsequent
        ``get_mean_scores`` so the printed table never presents the
        partial mean of the frames before the drop as a complete one."""
        writer, self._image_writer = getattr(self, "_image_writer",
                                             None), None
        try:
            if writer is not None:
                writer.close()
        finally:
            for f in self._files.values():
                f.close()
            self._files = {}
        # completion record for EVREAL_RESUME: written only once every
        # frame's files are flushed, so its presence implies a finished run
        import json

        # a metric with zero recorded scores despite evaluated frames was
        # dropped by trace-time validation — equally incomplete
        complete = [m for m in self.metric_names
                    if m not in set(dropped)
                    and (self.scores[m] or not self.quan_eval_indices)]
        self._dropped = set(dropped)
        mean_scores = {k: v for k, v in self.get_mean_scores().items()
                       if k in complete}
        with open(self._done_path(), "w", encoding="utf-8") as f:
            json.dump({"num_evaluated": self.get_num_quan_evaluations(),
                       "mean_scores": mean_scores,
                       "metrics": complete,
                       "settings": self.run_settings}, f)

    def get_num_quan_evaluations(self):
        return len(self.quan_eval_indices)

    def get_mean_scores(self):
        dropped = getattr(self, "_dropped", ())
        out = {}
        for name in self.metric_names:
            vals = self.scores[name]
            # a runtime-dropped metric has partial scores; report the
            # no-result sentinel, matching its exclusion from done.json
            out[name] = (sum(vals) / len(vals)
                         if vals and name not in dropped else -1)
        return out

    # -- videos ---------------------------------------------------------------

    def create_video(self):
        from evreal_tpu.harness.video import create_vid_from_recon_folder

        if self.save_images:
            create_vid_from_recon_folder(self.output_dir)
        else:
            print("Can not create video when save_images is False")

    def create_processed_video(self):
        from evreal_tpu.harness.video import create_vid_from_recon_folder

        if self.save_processed_images:
            shutil.copy2(self._ts_path(), self.processed_output_dir)
            create_vid_from_recon_folder(self.processed_output_dir)
        else:
            print("Can not create processed video when save_processed_images"
                  " is False")
