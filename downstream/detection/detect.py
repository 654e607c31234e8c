#!/usr/bin/env python
"""YOLOv7 car detection on reconstructed frames (reference
downstream_tasks/detection/detect.py). Writes per-frame box files consumed by
pascal_voc_map.py and annotated drawings.

Requires the ``yolov7`` pip package + yolov7.pt weights (not baked into this
image); exits with a clear message when absent.
"""

import argparse
import glob
import os

import cv2
from tqdm import tqdm


def parse_arguments():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="reconstruction PNG directory")
    p.add_argument("--output", required=True, help="base output folder")
    p.add_argument("--frame-list", default="frame_list.txt",
                   help="file of frame indices to process")
    p.add_argument("--img-size", type=int, default=1280)
    p.add_argument("--conf-thres", type=float, default=0.25)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--device", default="cpu")
    return p.parse_args()


def main(args):
    try:
        import yolov7
    except ImportError:
        raise SystemExit("detect.py needs the 'yolov7' pip package "
                         "(pip install yolov7detect) — not available here")

    model = yolov7.load("yolov7.pt", device=args.device, trace=False)
    model.conf = args.conf_thres
    model.iou = args.iou_thres

    base = os.path.join(args.output, os.path.basename(args.input))
    drawings = os.path.join(base, "drawings")
    boxes = os.path.join(base, "boxes")
    os.makedirs(drawings, exist_ok=True)
    os.makedirs(boxes, exist_ok=True)

    with open(args.frame_list, encoding="utf-8") as f:
        frame_ids = [int(line) for line in f.read().splitlines()]
    images = sorted(glob.glob(os.path.join(args.input, "*.png")))
    images = [images[i] for i in frame_ids]

    for img_path in tqdm(images):
        frame_id = int(os.path.splitext(os.path.basename(img_path))[0]
                       .split("_")[-1])
        img = cv2.imread(img_path)
        results = model(img, size=args.img_size, augment=True)
        dets = results.pred[0].cpu().numpy()
        with open(os.path.join(boxes, f"frame_{frame_id}.txt"), "w",
                  encoding="utf-8") as f:
            for det in dets:
                x1, y1, x2, y2, conf, cls = det[:6]
                if int(cls) != 2:  # COCO class 2 == car
                    continue
                f.write(f"car {conf} {int(x1)} {int(y1)} {int(x2)} "
                        f"{int(y2)}\n")
                cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)),
                              (0, 255, 0), 2)
                cv2.putText(img, f"car: {conf:.2f}", (int(x1), int(y1) - 10),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 2)
        cv2.imwrite(os.path.join(drawings, f"frame_{frame_id}.png"), img)


if __name__ == "__main__":
    main(parse_arguments())
