#!/usr/bin/env python
"""Convert ROS bags (dvs events + mono8 frames) to the npy memmap format.
Reference semantics (tools/bag_to_npy.py): decreasing image timestamps
repaired by neighbor averaging, timestamps zeroed at the global minimum,
``image_event_indices = searchsorted(events_ts, images_ts, 'right') - 1``.

Uses ``embag``/``rosbag`` when installed; otherwise falls back to the
built-in pure-Python bag reader (evreal_tpu/utils/rosbag.py), which also
decodes EventArray messages vectorized instead of the reference's per-event
Python loop (tools/bag_to_npy.py:40-45).
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

try:
    import embag as rosbag
except ImportError:  # pragma: no cover - optional dependency
    try:
        import rosbag
    except ImportError:
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from evreal_tpu.utils import rosbag


def _ts_float(ts):
    return ts.secs + ts.nsecs / 1e9


def _decode_image_mono8(msg):
    """sensor_msgs/Image -> mono8 ndarray, honoring the row stride and the
    common encodings (the reference's CvBridge().imgmsg_to_cv2(msg, 'mono8'),
    tools/bag_to_npy.py:40 — CvBridge is unavailable without ROS)."""
    import cv2

    h, w = msg.height, msg.width
    enc = (getattr(msg, "encoding", "mono8") or "mono8").lower()
    channels = {"mono8": 1, "8uc1": 1, "rgb8": 3, "bgr8": 3,
                "rgba8": 4, "bgra8": 4}.get(enc)
    if channels is None and enc.startswith("bayer_"):
        channels = 1
    itemsize = 1
    if channels is None and enc in ("mono16", "16uc1"):
        channels, itemsize = 1, 2
    if channels is None:
        raise ValueError(f"unsupported image encoding {enc!r}")

    step = int(getattr(msg, "step", 0)) or w * channels * itemsize
    dtype = np.uint16 if itemsize == 2 else np.uint8
    rows = np.frombuffer(msg.data, np.uint8)[: h * step].reshape(h, step)
    img = rows[:, : w * channels * itemsize].view(dtype).reshape(
        h, w, channels) if channels > 1 else \
        rows[:, : w * itemsize].view(dtype).reshape(h, w)
    if getattr(msg, "is_bigendian", 0) and itemsize == 2:
        img = img.byteswap()

    if enc in ("mono8", "8uc1"):
        return np.ascontiguousarray(img)
    if enc in ("mono16", "16uc1"):
        return (img >> 8).astype(np.uint8)
    if enc.startswith("bayer_"):
        pattern = {"bayer_rggb8": cv2.COLOR_BayerBG2GRAY,
                   "bayer_bggr8": cv2.COLOR_BayerRG2GRAY,
                   "bayer_gbrg8": cv2.COLOR_BayerGR2GRAY,
                   "bayer_grbg8": cv2.COLOR_BayerGB2GRAY}[enc]
        return cv2.cvtColor(np.ascontiguousarray(img), pattern)
    code = {"rgb8": cv2.COLOR_RGB2GRAY, "bgr8": cv2.COLOR_BGR2GRAY,
            "rgba8": cv2.COLOR_RGBA2GRAY,
            "bgra8": cv2.COLOR_BGRA2GRAY}[enc]
    return cv2.cvtColor(np.ascontiguousarray(img), code)


def bag_to_npy(bag_path, output_path, event_topic, image_topic):
    import cv2

    xs, ys, ts, ps = [], [], [], []
    images, images_ts = [], []
    sensor_size = None
    bag = rosbag.Bag(bag_path)
    for topic, msg, _ in bag.read_messages([image_topic, event_topic]):
        if topic == event_topic:
            if hasattr(msg, "xs"):  # built-in reader: vectorized columns
                xs.append(np.asarray(msg.xs, np.int64))
                ys.append(np.asarray(msg.ys, np.int64))
                ts.append(msg.ts_float)
                ps.append(msg.ps.astype(np.int64))
            else:  # embag/rosbag: per-event objects
                ev = msg.events
                xs.append(np.array([e.x for e in ev], np.int64))
                ys.append(np.array([e.y for e in ev], np.int64))
                ts.append(np.array([_ts_float(e.ts) for e in ev]))
                ps.append(np.array([1 if e.polarity else 0 for e in ev],
                                   np.int64))
        else:
            images_ts.append(_ts_float(msg.header.stamp))
            img = _decode_image_mono8(msg)
            if sensor_size is None:
                sensor_size = img.shape[:2]
            elif sensor_size != img.shape[:2]:
                padded = np.zeros(sensor_size, np.uint8)
                padded[:img.shape[0], :img.shape[1]] = img
                img = padded
            images.append(img)
    bag.close()

    if not ts or sum(len(a) for a in ts) == 0:
        raise ValueError(
            f"no events on topic {event_topic!r} in {bag_path} — check "
            f"--event_topic (topics present: varies per bag)")
    if not images:
        raise ValueError(
            f"no images on topic {image_topic!r} in {bag_path} — check "
            f"--image_topic")
    events_ts = np.concatenate(ts)
    events_xy = np.stack([np.concatenate(xs), np.concatenate(ys)], -1)
    events_p = np.concatenate(ps)
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
