#!/usr/bin/env bash
# Download the benchmark datasets (same public sources the reference uses)
# and convert them to the npy memmap format. Usage:
#   tools/download_data.sh ECD|MVSEC|HQF|NCaltech101|TPAMI20_HDR|FPVDR
# After download, convert rosbags with: python tools/bag_to_npy.py data/<DS>
set -euo pipefail

DS="${1:?usage: download_data.sh <dataset>}"
mkdir -p data
cd data

ecd() {
  mkdir -p ECD && cd ECD
  for seq in boxes_6dof calibration dynamic_6dof office_zigzag poster_6dof \
             shapes_6dof slider_depth; do
    wget -nc "https://rpg.ifi.uzh.ch/datasets/davis/${seq}.bag"
  done
}

mvsec() {
  mkdir -p MVSEC && cd MVSEC
  base="http://visiondata.cis.upenn.edu/mvsec"
  for seq in indoor_flying/indoor_flying{1,2,3,4}_data \
             outdoor_day/outdoor_day{1,2}_data \
             outdoor_night/outdoor_night{1,2,3}_data; do
    wget -nc "${base}/${seq}.bag"
  done
}

hqf() {
  # HQF is hosted on Google Drive; needs gdown
  gdown https://drive.google.com/drive/folders/18Xdr6pxJX0ZXTrXW9tK0hC3ZpmKDIt6_ -O HQF --folder
}

ncaltech101() {
  gdown 1hr28hw9i9xOR_-KqdTB5aSbj2XkOdZVG
  unzip -q Caltech101.zip && rm Caltech101.zip
}

tpami20_hdr() {
  mkdir -p TPAMI20 && cd TPAMI20
  for seq in hdr_selfie hdr_tunnel hdr_sun; do
    wget -nc "https://rpg.ifi.uzh.ch/data/E2VID/datasets/TPAMI/events/${seq}.zip"
    unzip -q "${seq}.zip" && rm "${seq}.zip"
  done
}

fpvdr() {
  mkdir -p FPVDR && cd FPVDR
  base="http://rpg.ifi.uzh.ch/datasets/uzh-fpv-newer-versions/v3"
  for seq in indoor_45_1_davis indoor_45_2_davis_with_gt indoor_45_3_davis \
             indoor_45_4_davis_with_gt indoor_45_9_davis_with_gt \
             indoor_45_11_davis indoor_45_12_davis_with_gt \
             indoor_45_13_davis_with_gt indoor_45_14_davis_with_gt \
             indoor_45_16_davis indoor_forward_3_davis_with_gt \
             indoor_forward_5_davis_with_gt indoor_forward_6_davis_with_gt \
             indoor_forward_7_davis_with_gt indoor_forward_8_davis \
             indoor_forward_9_davis_with_gt indoor_forward_10_davis_with_gt \
             indoor_forward_11_davis indoor_forward_12_davis \
             outdoor_forward_1_davis_with_gt outdoor_forward_2_davis \
             outdoor_forward_3_davis_with_gt outdoor_forward_5_davis_with_gt \
             outdoor_forward_6_davis outdoor_forward_9_davis \
             outdoor_forward_10_davis; do
    wget -nc "${base}/${seq}.bag"
  done
}

case "$DS" in
  ECD) ecd ;;
  MVSEC) mvsec ;;
  HQF) hqf ;;
  NCaltech101) ncaltech101 ;;
  TPAMI20_HDR) tpami20_hdr ;;
  FPVDR) fpvdr ;;
  *) echo "unknown dataset $DS" >&2; exit 1 ;;
esac
