#!/usr/bin/env bash
# Run YOLOv7 detection over every method's MVSEC-night reconstructions
# (reference downstream_tasks/detection/detect_all.sh).
set -euo pipefail
for m in E2VID FireNet E2VID+ FireNet+ SPADE-E2VID SSL-E2VID ET-Net HyperE2VID groundtruth; do
  python detect.py --input "../../outputs/std/MVSEC_night_1/outdoor_night1_data/${m}/" \
    --output "outputs/${m}" --conf-thres 0
done
