#!/usr/bin/env bash
# Convert the downloaded BS-ERGB handheld sequences to the npy memmap format
# (reference tools/prepare_BS_ERGB.sh). Usage: prepare_BS_ERGB.sh <bs_ergb_root>
set -euo pipefail
SRC="${1:?usage: prepare_BS_ERGB.sh <bs_ergb_root>}"
mkdir -p data/BS_ERGB
for seq in may29_handheld_01 may29_handheld_02 may29_handheld_03 \
           may29_handheld_04 may29_rooftop_handheld_01 \
           may29_rooftop_handheld_02 may29_rooftop_handheld_03 \
           may29_rooftop_handheld_05 street_crossing_07 street_crossing_08; do
  python tools/bs_ergb_to_npy.py "$SRC/$seq" --output_dir data/BS_ERGB
done
