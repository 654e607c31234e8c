#!/usr/bin/env python
"""Convert ROS bags (dvs events + mono8 frames) to the npy memmap format.
Reference semantics (tools/bag_to_npy.py): decreasing image timestamps
repaired by neighbor averaging, timestamps zeroed at the global minimum,
``image_event_indices = searchsorted(events_ts, images_ts, 'right') - 1``.

Requires a rosbag reader (``embag`` or ``rosbag``); those are not baked into
this image, so the script exits with a clear message when absent.
"""

import argparse
import glob
import json
import os

import numpy as np

try:
    import embag as rosbag
except ImportError:  # pragma: no cover - optional dependency
    try:
        import rosbag
    except ImportError:
        rosbag = None


def _ts_float(ts):
    return ts.secs + ts.nsecs / 1e9


def bag_to_npy(bag_path, output_path, event_topic, image_topic):
    import cv2

    xs, ys, ts, ps = [], [], [], []
    images, images_ts = [], []
    sensor_size = None
    bag = rosbag.Bag(bag_path)
    for topic, msg, _ in bag.read_messages([image_topic, event_topic]):
        if topic == event_topic:
            for e in msg.events:
                xs.append(e.x)
                ys.append(e.y)
                ts.append(_ts_float(e.ts))
                ps.append(1 if e.polarity else 0)
        else:
            images_ts.append(_ts_float(msg.header.stamp))
            h, w = msg.height, msg.width
            img = np.frombuffer(msg.data, np.uint8).reshape(h, w)
            if sensor_size is None:
                sensor_size = img.shape[:2]
            elif sensor_size != img.shape[:2]:
                padded = np.zeros(sensor_size, np.uint8)
                padded[:img.shape[0], :img.shape[1]] = img
                img = padded
            images.append(img)
    bag.close()

    events_ts = np.array(ts)
    events_xy = np.stack([xs, ys], -1)
    events_p = np.array(ps)
    images = np.stack(images)[..., None]
    images_ts = np.array(images_ts)

    # repair decreasing frame timestamps (neighbor average)
    mask = images_ts[:-1] > images_ts[1:]
    avg = (images_ts[:-2] + images_ts[2:]) / 2.0
    images_ts[1:-1][mask[:-1]] = avg[mask[:-1]]
    images_ts = images_ts[:, None]

    min_ts = min(events_ts.min(), images_ts.min())
    events_ts -= min_ts
    images_ts -= min_ts
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
        json.dump({"sensor_resolution": list(sensor_size)}, f)


if __name__ == "__main__":
    if rosbag is None:
        raise SystemExit("bag_to_npy needs 'embag' or 'rosbag' "
                         "(pip install embag) — not available in this image")
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("path", help="directory of ROS bags")
    ap.add_argument("--event_topic", default="/dvs/events")
    ap.add_argument("--image_topic", default="/dvs/image_raw")
    ap.add_argument("--remove", action="store_true")
    args = ap.parse_args()
    for path in sorted(glob.glob(os.path.join(args.path, "*.bag"))):
        print(f"Processing {path}")
        out = os.path.splitext(path)[0]
        os.makedirs(out, exist_ok=True)
        try:
            bag_to_npy(path, out, args.event_topic, args.image_topic)
        except Exception as e:  # noqa: BLE001
            print(f"Failed to convert {path}: {e}")
            continue
        if args.remove:
            os.remove(path)
