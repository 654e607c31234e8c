#!/usr/bin/env python
"""Simulate event-camera data from plain video (ESIM-style) into the npy
memmap sequence format (README.md:43-59 of the reference defines the
directory contract; same layout bag_to_npy.py emits).

A capability extension over the reference (which only converts recorded
event data): any video or frame folder becomes a training/eval sequence
with ground-truth frames, following the standard per-pixel log-intensity
contrast-threshold model (Rebecq et al., ESIM; cf. the V2V video-to-voxel
line of work):

  an event (x, y, t, p) fires each time log I(x, y) crosses a multiple of
  the contrast threshold C since the last event at that pixel; timestamps
  are linearly interpolated between frames; the per-pixel reference level
  advances by exactly k*C per fired event (no drift accumulation).

    python tools/video_to_npy.py input.mp4 out_dir --fps 0 --ct 0.2
    python tools/video_to_npy.py frames_dir out_dir --fps 30

Outputs: events_{ts,xy,p}.npy, images.npy (N,H,W,1 uint8), images_ts.npy,
image_event_indices.npy (= searchsorted(events_ts, images_ts,'right')-1,
bag_to_npy.py:80-81), metadata.json.
"""

import argparse
import glob
import json
import os

import numpy as np

LOG_EPS = 1e-3  # linear-to-log safety offset for dark pixels


def frames_from_path(path, fps):
    """Yield (gray_uint8, t_seconds). Directory of images or a video file."""
    import cv2

    if os.path.isdir(path):
        files = sorted(
            f for f in glob.glob(os.path.join(path, "*"))
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")))
        if not files:
            raise SystemExit(f"no image frames under {path}")
        if fps <= 0:
            raise SystemExit("--fps is required for a frame directory")
        shape0 = None
        for i, f in enumerate(files):
            img = cv2.imread(f, cv2.IMREAD_GRAYSCALE)
            if img is None:
                raise SystemExit(f"unreadable image frame {f}")
            if shape0 is None:
                shape0 = img.shape
            elif img.shape != shape0:
                raise SystemExit(
                    f"frame {f} has shape {img.shape}, expected {shape0} "
                    f"(all frames in {path} must match)")
            yield img, i / fps
        return
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise SystemExit(f"cannot open video {path}")
    vid_fps = fps if fps > 0 else (cap.get(cv2.CAP_PROP_FPS) or 30.0)
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        yield cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY), i / vid_fps
        i += 1
    cap.release()


def events_between(ref, log1, t0, t1, ct, ys_grid, xs_grid):
    """Vectorized threshold-crossing events for one frame interval.

    ref: per-pixel log level after the last event; log1: new frame's log
    intensity. Returns (xs, ys, ts, ps) sorted by ts, and the updated ref.
    """
    delta = log1 - ref
    n = np.floor(np.abs(delta) / ct).astype(np.int64)  # events per pixel
    sign = np.sign(delta)
    total = int(n.sum())
    if total == 0:
        return (np.empty(0, np.int64),) * 2 + (np.empty(0),) + \
            (np.empty(0, np.int64),), ref
    max_n = int(n.max())
    xs, ys, ts, ps = [], [], [], []
    for k in range(1, max_n + 1):
        m = n >= k
        count = int(m.sum())
        if count == 0:
            break
        xs.append(xs_grid[m])
        ys.append(ys_grid[m])
        # the k-th crossing sits at fraction k*ct/|delta| of the interval
        frac = (k * ct) / np.abs(delta[m])
        ts.append(t0 + (t1 - t0) * frac)
        ps.append((sign[m] > 0).astype(np.int64))
    xs = np.concatenate(xs)
    ys = np.concatenate(ys)
    ts = np.concatenate(ts)
    ps = np.concatenate(ps)
    order = np.argsort(ts, kind="stable")
    ref = ref + n * sign * ct  # advance by exactly the fired crossings
    return (xs[order], ys[order], ts[order], ps[order]), ref


def video_to_npy(input_path, output_path, fps=0.0, ct=0.2):
    os.makedirs(output_path, exist_ok=True)
    it = frames_from_path(input_path, fps)
    first, t_first = next(it)
    h, w = first.shape
    ys_grid, xs_grid = np.mgrid[0:h, 0:w]
    ys_grid = ys_grid.ravel()
    xs_grid = xs_grid.ravel()

    log_prev = np.log(first.astype(np.float64) / 255.0 + LOG_EPS).ravel()
    ref = log_prev.copy()
    images = [first]
    images_ts = [t_first]
    all_xs, all_ys, all_ts, all_ps = [], [], [], []
    t_prev = t_first
    for img, t in it:
        logc = np.log(img.astype(np.float64) / 255.0 + LOG_EPS).ravel()
        (xs, ys, ts, ps), ref = events_between(ref, logc, t_prev, t, ct,
                                               ys_grid, xs_grid)
        all_xs.append(xs)
        all_ys.append(ys)
        all_ts.append(ts)
        all_ps.append(ps)
        images.append(img)
        images_ts.append(t)
        t_prev = t

    if not all_xs or sum(len(a) for a in all_xs) == 0:
        raise SystemExit("no events generated — lower --ct or check input")
    events_ts = np.concatenate(all_ts)
    events_xy = np.stack([np.concatenate(all_xs),
                          np.concatenate(all_ys)], -1).astype(np.int16)
    events_p = np.concatenate(all_ps).astype(np.uint8)
    images = np.stack(images)[..., None]
    images_ts = np.asarray(images_ts, np.float64)[:, None]

    indices = np.clip(np.searchsorted(events_ts, images_ts, "right") - 1,
                      0, len(events_ts) - 1)
    j = lambda n: os.path.join(output_path, n)
    np.save(j("events_ts.npy"), events_ts)
    np.save(j("events_xy.npy"), events_xy)
    np.save(j("events_p.npy"), events_p)
    np.save(j("images.npy"), images)
    np.save(j("images_ts.npy"), images_ts)
    np.save(j("image_event_indices.npy"), indices)
    with open(j("metadata.json"), "w", encoding="utf-8") as f:
        json.dump({"sensor_resolution": [h, w]}, f)
    print(f"{output_path}: {len(events_ts)} events, {len(images)} frames, "
          f"{h}x{w}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", help="video file or directory of frames")
    ap.add_argument("output", help="output sequence directory")
    ap.add_argument("--fps", type=float, default=0.0,
                    help="frame rate (required for frame dirs; 0 = read "
                         "from the video container)")
    ap.add_argument("--ct", type=float, default=0.2,
                    help="contrast threshold in log-intensity units")
    args = ap.parse_args()
    video_to_npy(args.input, args.output, fps=args.fps, ct=args.ct)
