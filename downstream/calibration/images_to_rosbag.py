#!/usr/bin/env python
"""Pack reconstructed PNG frames into a rosbag for kalibr calibration
(reference downstream_tasks/calibration/images_to_rosbag.py). Frame index in
the filename becomes the ROS timestamp (index + '00' as nanoseconds).

Uses rospy/rosbag when installed; otherwise the built-in pure-Python bag
writer (evreal_tpu/utils/rosbag.py) produces a spec-conformant v2.0 bag
kalibr can read."""

import argparse
import glob
import os


def main():
    try:
        import rosbag
        from rospy import Time
        from sensor_msgs.msg import Image
    except ImportError:
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))))
        from evreal_tpu.utils import rosbag
        from evreal_tpu.utils.rosbag import Image, Time
    import cv2

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rosbag_folder", required=True)
    ap.add_argument("--image_folder", required=True)
    ap.add_argument("--image_topic", required=True)
    args = ap.parse_args()

    os.makedirs(args.rosbag_folder, exist_ok=True)
    bag_path = os.path.join(args.rosbag_folder, "reconstruction.bag")
    images = sorted(glob.glob(os.path.join(args.image_folder, "*.png")))
    print(f"Found {len(images)} images")

    with rosbag.Bag(bag_path, "w") as bag:
        for image_path in images:
            stamp = os.path.splitext(os.path.basename(image_path))[0]
            stamp = stamp[6:] + "00"  # frame_%010d -> pseudo-nanoseconds
            img = cv2.imread(image_path, 0)
            ts = Time(secs=int(stamp[0:-9]), nsecs=int(stamp[-9:]))
            msg = Image()
            msg.header.stamp = ts
            msg.height, msg.width = img.shape
            msg.step = msg.width
            msg.encoding = "mono8"
            msg.data = img.tobytes()
            bag.write(args.image_topic, msg, ts)


if __name__ == "__main__":
    main()
