"""Pure-Python rosbag v2.0 module: write/read round-trips, on-disk format
structure (so standard rosbag/kalibr can read what we write), and the
bag_to_npy / images_to_rosbag converters running on it end-to-end
(reference: tools/bag_to_npy.py, downstream_tasks/calibration/
images_to_rosbag.py — both need a ROS stack there; here they self-contain)."""

import json
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from evreal_tpu.utils import rosbag as rb

TOOLS = "/root/repo/tools"
sys.path.insert(0, TOOLS)


def _image_msg(seed, h=12, w=16, stamp=None):
    rng = np.random.default_rng(seed)
    msg = rb.Image()
    msg.header.stamp = stamp or rb.Time(seed + 1, 500)
    msg.header.frame_id = "cam0"
    msg.height, msg.width = h, w
    msg.encoding = "mono8"
    msg.step = w
    msg.data = rng.integers(0, 256, (h, w), np.uint8).tobytes()
    return msg


def _event_msg(seed, n=100, h=12, w=16):
    rng = np.random.default_rng(seed)
    msg = rb.EventArray()
    msg.header.stamp = rb.Time(seed, 0)
    msg.height, msg.width = h, w
    msg.xs = rng.integers(0, w, n).astype(np.uint16)
    msg.ys = rng.integers(0, h, n).astype(np.uint16)
    msg.ts_secs = np.sort(rng.integers(seed, seed + 3, n)).astype(np.uint32)
    msg.ts_nsecs = rng.integers(0, 10**9, n).astype(np.uint32)
    msg.ps = rng.integers(0, 2, n).astype(np.uint8)
    return msg


def test_roundtrip_images_and_events(tmp_path):
    path = str(tmp_path / "rt.bag")
    imgs = [_image_msg(i) for i in range(3)]
    evts = [_event_msg(i) for i in range(3)]
    with rb.Bag(path, "w") as bag:
        for i in range(3):
            bag.write("/dvs/events", evts[i], rb.Time(i, 1))
            bag.write("/dvs/image_raw", imgs[i], rb.Time(i, 2))

    got = list(rb.Bag(path).read_messages())
    assert [t for t, _, _ in got] == ["/dvs/events", "/dvs/image_raw"] * 3
    for i in range(3):
        topic, ev, t = got[2 * i]
        assert (t.secs, t.nsecs) == (i, 1)
        np.testing.assert_array_equal(ev.xs, evts[i].xs)
        np.testing.assert_array_equal(ev.ys, evts[i].ys)
        np.testing.assert_array_equal(ev.ts_secs, evts[i].ts_secs)
        np.testing.assert_array_equal(ev.ts_nsecs, evts[i].ts_nsecs)
        np.testing.assert_array_equal(ev.ps, evts[i].ps)
        assert (ev.height, ev.width) == (12, 16)
        topic, im, t = got[2 * i + 1]
        assert im.data == imgs[i].data
        assert (im.height, im.width, im.step) == (12, 16, 16)
        assert im.encoding == "mono8"
        assert im.header.frame_id == "cam0"
        assert (im.header.stamp.secs, im.header.stamp.nsecs) == (i + 1, 500)

    # topic filter + object-view compat path (per-event e.x/e.ts.secs)
    only = list(rb.Bag(path).read_messages(["/dvs/events"]))
    assert len(only) == 3
    e0 = only[0][1].events[0]
    assert (e0.x, e0.y) == (evts[0].xs[0], evts[0].ys[0])
    assert e0.ts.secs == evts[0].ts_secs[0]
    assert e0.polarity == bool(evts[0].ps[0])


def test_bz2_and_multichunk(tmp_path):
    path = str(tmp_path / "chunks.bag")
    bag = rb.Bag(path, "w", compression="bz2")
    bag._CHUNK_TARGET = 4096  # force several chunks
    msgs = [_image_msg(i, h=16, w=64) for i in range(12)]
    for i, m in enumerate(msgs):
        bag.write("/cam", m, rb.Time(i, 0))
    bag.close()

    got = list(rb.Bag(path).read_messages())
    assert len(got) == 12
    for i, (topic, m, t) in enumerate(got):
        assert topic == "/cam" and t.secs == i
        assert m.data == msgs[i].data

    # more than one chunk record was actually written
    raw = open(path, "rb").read()
    assert raw.count(b"compression=bz2") >= 2


def test_on_disk_structure(tmp_path):
    """Spec conformance points a foreign rosbag reader depends on."""
    path = str(tmp_path / "spec.bag")
    with rb.Bag(path, "w") as bag:
        bag.write("/cam", _image_msg(0), rb.Time(5, 7))
    raw = open(path, "rb").read()
    assert raw.startswith(b"#ROSBAG V2.0\n")
    # bag header record is exactly 4096 bytes, space-padded
    pos = 13
    (hlen,) = struct.unpack_from("<I", raw, pos)
    fields = {}
    p = pos + 4
    end = p + hlen
    while p < end:
        (flen,) = struct.unpack_from("<I", raw, p)
        name, _, value = raw[p + 4:p + 4 + flen].partition(b"=")
        fields[name.decode()] = value
        p += 4 + flen
    (dlen,) = struct.unpack_from("<I", raw, end)
    assert 4 + hlen + 4 + dlen == 4096
    assert raw[end + 4:end + 4 + dlen] == b" " * dlen
    assert fields["op"] == b"\x03"
    assert struct.unpack("<I", fields["conn_count"])[0] == 1
    assert struct.unpack("<I", fields["chunk_count"])[0] == 1
    # index_pos points at the connection record section (op=0x07 first)
    (index_pos,) = struct.unpack("<Q", fields["index_pos"])
    (ih,) = struct.unpack_from("<I", raw, index_pos)
    tail = rb._parse_fields(raw[index_pos + 4:index_pos + 4 + ih])
    assert tail["op"] == b"\x07"
    assert tail["topic"] == b"/cam"
    # the connection carries the canonical Image identity
    conn_info = rb.Bag(path).get_type_and_topic_info()
    assert conn_info == {0: ("/cam", "sensor_msgs/Image")}
    assert rb._IMAGE_MD5.encode() in raw


def test_bag_to_npy_end_to_end(tmp_path):
    import bag_to_npy as b2n

    h, w = 10, 14
    bag_path = str(tmp_path / "seq.bag")
    with rb.Bag(bag_path, "w") as bag:
        for i in range(4):
            bag.write("/dvs/events", _event_msg(i + 1, n=50, h=h, w=w),
                      rb.Time(i + 1, 0))
            bag.write("/dvs/image_raw", _image_msg(i, h=h, w=w,
                                                   stamp=rb.Time(i + 1, 10)),
                      rb.Time(i + 1, 10))
    out = tmp_path / "seq"
    out.mkdir()
    b2n.bag_to_npy(bag_path, str(out), "/dvs/events", "/dvs/image_raw")

    ets = np.load(out / "events_ts.npy")
    exy = np.load(out / "events_xy.npy")
    ep = np.load(out / "events_p.npy")
    images = np.load(out / "images.npy")
    its = np.load(out / "images_ts.npy")
    idx = np.load(out / "image_event_indices.npy")
    assert len(ets) == len(exy) == len(ep) == 200
    assert images.shape == (4, h, w, 1)
    assert ep.min() >= 0 and ep.max() <= 1
    # timestamps zeroed at the global minimum
    assert min(ets.min(), its.min()) == 0.0
    # reference indexing contract (tools/bag_to_npy.py:80-81)
    expect = np.clip(np.searchsorted(ets, its, "right") - 1, 0,
                     len(ets) - 1)
    np.testing.assert_array_equal(idx, expect)
    with open(out / "metadata.json", encoding="utf-8") as f:
        assert json.load(f)["sensor_resolution"] == [h, w]

    # the produced directory is loadable by the data layer
    from evreal_tpu.data import Sequence
    seq = Sequence(str(out), num_bins=5,
                   voxel_method={"method": "between_frames"})
    assert seq.sensor_resolution == (h, w)
    assert seq.num_events == 200


def test_images_to_rosbag_cli(tmp_path):
    import cv2

    img_dir = tmp_path / "frames"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    frames = []
    for i in range(3):
        img = rng.integers(0, 256, (8, 12), np.uint8)
        frames.append(img)
        cv2.imwrite(str(img_dir / f"frame_{i:010d}.png"), img)
    bag_dir = tmp_path / "bags"
    env = dict(os.environ, PYTHONPATH="/root/repo")
    subprocess.run(
        [sys.executable, "/root/repo/downstream/calibration/"
         "images_to_rosbag.py", "--rosbag_folder", str(bag_dir),
         "--image_folder", str(img_dir), "--image_topic", "/cam0/image_raw"],
        check=True, env=env)

    got = list(rb.Bag(str(bag_dir / "reconstruction.bag"))
               .read_messages(["/cam0/image_raw"]))
    assert len(got) == 3
    for i, (topic, msg, t) in enumerate(got):
        assert msg.encoding == "mono8"
        assert (msg.height, msg.width) == (8, 12)
        np.testing.assert_array_equal(
            np.frombuffer(msg.data, np.uint8).reshape(8, 12), frames[i])
        # frame index + '00' pseudo-nanoseconds (reference stamp scheme)
        assert (t.secs, t.nsecs) == (0, i * 100)


def test_repeated_reads_and_truncation(tmp_path):
    path = str(tmp_path / "rr.bag")
    with rb.Bag(path, "w") as bag:
        for i in range(3):
            bag.write("/cam", _image_msg(i), rb.Time(i, 0))
    bag = rb.Bag(path)
    first = [t.secs for _, _, t in bag.read_messages()]
    second = [t.secs for _, _, t in bag.read_messages()]
    assert first == second == [0, 1, 2]  # rosbag.Bag allows repeated reads

    # a bag truncated mid-record raises a clear error, not struct garbage
    raw = open(path, "rb").read()
    trunc = str(tmp_path / "trunc.bag")
    open(trunc, "wb").write(raw[:len(raw) - 7])
    with pytest.raises(ValueError, match="truncated bag"):
        list(rb.Bag(trunc).read_messages())


def test_bag_to_npy_wrong_topic_message(tmp_path):
    import bag_to_npy as b2n

    path = str(tmp_path / "seq.bag")
    with rb.Bag(path, "w") as bag:
        bag.write("/dvs/image_raw", _image_msg(0), rb.Time(1, 0))
    out = tmp_path / "seq"
    out.mkdir()
    with pytest.raises(ValueError, match="no events on topic"):
        b2n.bag_to_npy(path, str(out), "/wrong/topic", "/dvs/image_raw")


def test_message_md5_recipe_and_eventarray_identity(tmp_path):
    """The genmsg md5 recipe (builtin fields verbatim, nested types replaced
    by their md5, array suffix dropped) reproduces the documented
    sensor_msgs/Image md5 — validating the rule — and derives the
    dvs_msgs/EventArray md5 we hard-code; written event bags carry it in
    their connection record (strict consumers reject md5sum '*')."""
    import hashlib

    def m(s):
        return hashlib.md5(s.encode()).hexdigest()

    header = m("uint32 seq\ntime stamp\nstring frame_id")
    image = m(f"{header} header\nuint32 height\nuint32 width\n"
              f"string encoding\nuint8 is_bigendian\nuint32 step\n"
              f"uint8[] data")
    assert image == rb._IMAGE_MD5  # documented value -> recipe is right
    event = m("uint16 x\nuint16 y\ntime ts\nbool polarity")
    earray = m(f"{header} header\nuint32 height\nuint32 width\n"
               f"{event} events")
    assert earray == rb._EVENTARRAY_MD5

    path = str(tmp_path / "events.bag")
    with rb.Bag(path, "w") as bag:
        bag.write("/dvs/events", _event_msg(1, n=10), rb.Time(1, 0))
    raw = open(path, "rb").read()
    assert rb._EVENTARRAY_MD5.encode() in raw
    assert b"md5sum=*" not in raw
    assert b"MSG: dvs_msgs/Event" in raw  # full definition embedded
