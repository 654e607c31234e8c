"""Video creation from a reconstruction folder (reference utils/create_vid.py:
fps = round(frame_count / duration) from timestamps.txt, output
``<dir>_<fps>Hz.mp4``). Uses cv2.VideoWriter since no ffmpeg binary ships in
this environment."""

import glob
import os

import cv2


def create_vid_from_recon_folder(folder_path, extension="mp4"):
    ts_path = os.path.join(folder_path, "timestamps.txt")
    with open(ts_path, encoding="utf-8") as f:
        lines = f.readlines()
    start_ts = float(lines[0].split()[1])
    end_ts = float(lines[-1].split()[1])
    duration = end_ts - start_ts
    frame_count = len(lines)
    fps = round(frame_count / duration) if duration > 0 else 30
    vid_path = os.path.normpath(folder_path) + f"_{fps}Hz.{extension}"
    if os.path.exists(vid_path):
        os.remove(vid_path)
    frames = sorted(glob.glob(os.path.join(folder_path, "frame_*.png")))
    if not frames:
        return
    first = cv2.imread(frames[0])
    h, w = first.shape[:2]
    writer = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    for fp in frames:
        writer.write(cv2.imread(fp))
    writer.release()
