"""Video creation from a reconstruction folder (reference utils/create_vid.py:
fps = round(frame_count / duration) from timestamps.txt, output
``<dir>_<fps>Hz.mp4``). Encodes with the ffmpeg binary at the reference's
settings (crf=11, preset slow, create_vid.py:20-28) when one is on PATH;
falls back to cv2.VideoWriter otherwise (no ffmpeg ships in this image)."""

import glob
import os
import shutil
import subprocess

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
    def _idx(path):
        return int(os.path.basename(path)[6:-4])

    ffmpeg = shutil.which("ffmpeg")
    contiguous = _idx(frames[-1]) - _idx(frames[0]) + 1 == len(frames)
    if ffmpeg is not None and contiguous:
        r = subprocess.run(
            [ffmpeg, "-y", "-framerate", str(fps),
             "-start_number", str(_idx(frames[0])), "-i",
             os.path.join(folder_path, "frame_%010d.png"),
             "-crf", "11", "-preset", "slow", "-pix_fmt", "yuv420p",
             vid_path], stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL, check=False)
        if r.returncode == 0:
            return
    # non-contiguous indices (keep_ratio gaps) or no/failed ffmpeg: cv2
    first = cv2.imread(frames[0])
    h, w = first.shape[:2]
    writer = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    for fp in frames:
        writer.write(cv2.imread(fp))
    writer.release()
