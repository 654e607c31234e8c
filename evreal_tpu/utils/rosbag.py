"""Pure-Python ROS bag (format v2.0) reader/writer.

The reference's dataset-prep (`tools/bag_to_npy.py`) and calibration packer
(`downstream_tasks/calibration/images_to_rosbag.py`) depend on the ROS stack
(`embag`/`rosbag`/`rospy`), which is not installable in this image. This
module implements the subset of the on-disk bag format those tools need so
they run self-contained:

- **Reader**: sequential scan of v2.0 records; `none` and `bz2` chunk
  compression built in (`lz4` used when the ``lz4`` package is present);
  deserializes ``sensor_msgs/Image`` and ``dvs_msgs/EventArray`` (events
  decoded vectorized into numpy arrays — the reference's per-event Python
  loop over ``msg.events``, tools/bag_to_npy.py:40-45, is the slow path).
- **Writer**: spec-conformant bags (bag-header record padded to 4096 bytes,
  chunked message data with per-connection index-data records, trailing
  connection + chunk-info index section) so standard `rosbag`/kalibr can
  read what we write.

Format reference: http://wiki.ros.org/Bags/Format/2.0. Record grammar:
``<header_len u32><header><data_len u32><data>`` where header is a sequence
of ``<len u32><name>=<value>`` fields; record type is the ``op`` field.
"""

import bz2
import io
import os
import struct

import numpy as np

_MAGIC = b"#ROSBAG V2.0\n"

_OP_MSG_DATA = 0x02
_OP_BAG_HEADER = 0x03
_OP_INDEX_DATA = 0x04
_OP_CHUNK = 0x05
_OP_CHUNK_INFO = 0x06
_OP_CONNECTION = 0x07

_U32 = struct.Struct("<I")
_U64 = struct.Struct("<Q")
_TIME = struct.Struct("<II")

# canonical ROS message identity for what the writer emits (kalibr reads
# Image messages back with the md5/definition stored in the connection)
_IMAGE_MD5 = "060021388200f6f0f447d0fcd9c64743"
_IMAGE_DEF = """\
# This message contains an uncompressed image
# (0, 0) is at top-left corner of image
#

Header header        # Header timestamp should be acquisition time of image

uint32 height         # image height, that is, number of rows
uint32 width          # image width, that is, number of columns

string encoding       # Encoding of pixels -- channel meaning, ordering, size

uint8 is_bigendian    # is this data bigendian?
uint32 step           # Full row length in bytes
uint8[] data          # actual matrix data, size is (step * rows)

================================================================================
MSG: std_msgs/Header
# Standard metadata for higher-level stamped data types.
uint32 seq
time stamp
string frame_id
"""

# dvs_msgs/EventArray identity, genmsg md5 recipe (builtin fields verbatim,
# nested types replaced by their md5, array suffix dropped):
#   header_md5     = md5("uint32 seq\ntime stamp\nstring frame_id")
#   event_md5      = md5("uint16 x\nuint16 y\ntime ts\nbool polarity")
#   eventarray_md5 = md5(f"{header_md5} header\nuint32 height\n"
#                        f"uint32 width\n{event_md5} events")
# The recipe is validated by reproducing _IMAGE_MD5 from the same rule
# (tests/test_rosbag.py); strict consumers (rosbag info/play, rqt_bag)
# reject connections whose md5sum is '*'.
_EVENTARRAY_MD5 = "5e8beee5a6c107e504c2e78903c224b8"
_EVENTARRAY_DEF = """\
# This message contains an array of events
Header header
uint32 height         # image height, that is, number of rows
uint32 width          # image width, that is, number of columns
Event[] events        # an array of events

================================================================================
MSG: std_msgs/Header
# Standard metadata for higher-level stamped data types.
uint32 seq
time stamp
string frame_id

================================================================================
MSG: dvs_msgs/Event
# A DVS event
uint16 x
uint16 y
time ts
bool polarity
"""

_EVENT_DTYPE = np.dtype([("x", "<u2"), ("y", "<u2"), ("secs", "<u4"),
                         ("nsecs", "<u4"), ("polarity", "u1")])
assert _EVENT_DTYPE.itemsize == 13  # packed dvs_msgs/Event wire size


class Time:
    """ROS time: (secs, nsecs) pair, rospy.Time-compatible surface."""

    __slots__ = ("secs", "nsecs")

    def __init__(self, secs=0, nsecs=0):
        self.secs = int(secs)
        self.nsecs = int(nsecs)

    @classmethod
    def from_sec(cls, t):
        secs = int(t)
        return cls(secs, int(round((t - secs) * 1e9)))

    def to_sec(self):
        return self.secs + self.nsecs / 1e9

    def __repr__(self):
        return f"Time({self.secs}, {self.nsecs})"

    def __eq__(self, other):
        return (self.secs, self.nsecs) == (other.secs, other.nsecs)

    def __lt__(self, other):
        return (self.secs, self.nsecs) < (other.secs, other.nsecs)


class Header:
    __slots__ = ("seq", "stamp", "frame_id")

    def __init__(self, seq=0, stamp=None, frame_id=""):
        self.seq = seq
        self.stamp = stamp if stamp is not None else Time()
        self.frame_id = frame_id


class Image:
    """sensor_msgs/Image with the fields the converters touch."""

    _type = "sensor_msgs/Image"

    def __init__(self):
        self.header = Header()
        self.height = 0
        self.width = 0
        self.encoding = ""
        self.is_bigendian = 0
        self.step = 0
        self.data = b""


class Event:
    """dvs_msgs/Event object view (compat path for per-event loops)."""

    __slots__ = ("x", "y", "ts", "polarity")

    def __init__(self, x, y, ts, polarity):
        self.x = x
        self.y = y
        self.ts = ts
        self.polarity = polarity


class EventArray:
    """dvs_msgs/EventArray; events decoded as numpy columns (`xs`, `ys`,
    `ts_secs`, `ts_nsecs`, `ps`) with an object-view `events` property."""

    _type = "dvs_msgs/EventArray"

    def __init__(self):
        self.header = Header()
        self.height = 0
        self.width = 0
        self.xs = np.empty(0, np.uint16)
        self.ys = np.empty(0, np.uint16)
        self.ts_secs = np.empty(0, np.uint32)
        self.ts_nsecs = np.empty(0, np.uint32)
        self.ps = np.empty(0, np.uint8)

    @property
    def ts_float(self):
        return self.ts_secs.astype(np.float64) + self.ts_nsecs / 1e9

    @property
    def events(self):
        return [Event(int(x), int(y), Time(int(s), int(n)), bool(p))
                for x, y, s, n, p in zip(self.xs, self.ys, self.ts_secs,
                                         self.ts_nsecs, self.ps)]


class RawMessage:
    """Fallback for message types this module does not deserialize."""

    def __init__(self, type_name, data):
        self._type = type_name
        self.data = data


# ---------------------------------------------------------------------------
# wire helpers


def _fields(name_values):
    out = []
    for name, value in name_values:
        field = name + b"=" + value
        out.append(_U32.pack(len(field)) + field)
    return b"".join(out)


def _parse_fields(buf):
    fields, pos = {}, 0
    while pos < len(buf):
        (flen,) = _U32.unpack_from(buf, pos)
        pos += 4
        field = buf[pos:pos + flen]
        pos += flen
        name, _, value = field.partition(b"=")
        fields[name.decode()] = value
    return fields


def _record(header_fields, data):
    header = _fields(header_fields)
    return (_U32.pack(len(header)) + header + _U32.pack(len(data)) + data)


def _read_record(f):
    lenbuf = f.read(4)
    if len(lenbuf) == 0:
        return None  # clean end of file / chunk
    if len(lenbuf) < 4:
        raise ValueError("truncated bag: partial record length")
    (hlen,) = _U32.unpack(lenbuf)
    hdr = f.read(hlen)
    dlenbuf = f.read(4)
    if len(hdr) < hlen or len(dlenbuf) < 4:
        raise ValueError("truncated bag: partial record header")
    header = _parse_fields(hdr)
    (dlen,) = _U32.unpack(dlenbuf)
    data = f.read(dlen)
    if len(data) < dlen:
        raise ValueError("truncated bag: partial record data")
    return header, data


def _time_bytes(t):
    return _TIME.pack(t.secs, t.nsecs)


def _parse_time(value):
    secs, nsecs = _TIME.unpack(value)
    return Time(secs, nsecs)


def _parse_header_msg(buf, pos):
    seq, secs, nsecs = struct.unpack_from("<III", buf, pos)
    pos += 12
    (flen,) = _U32.unpack_from(buf, pos)
    pos += 4
    frame_id = buf[pos:pos + flen].decode(errors="replace")
    pos += flen
    return Header(seq, Time(secs, nsecs), frame_id), pos


def _deserialize(type_name, buf):
    if type_name == "sensor_msgs/Image":
        msg = Image()
        msg.header, pos = _parse_header_msg(buf, 0)
        msg.height, msg.width = struct.unpack_from("<II", buf, pos)
        pos += 8
        (elen,) = _U32.unpack_from(buf, pos)
        pos += 4
        msg.encoding = buf[pos:pos + elen].decode()
        pos += elen
        msg.is_bigendian = buf[pos]
        (msg.step,) = _U32.unpack_from(buf, pos + 1)
        pos += 5
        (dlen,) = _U32.unpack_from(buf, pos)
        pos += 4
        msg.data = buf[pos:pos + dlen]
        return msg
    if type_name == "dvs_msgs/EventArray":
        msg = EventArray()
        msg.header, pos = _parse_header_msg(buf, 0)
        msg.height, msg.width = struct.unpack_from("<II", buf, pos)
        pos += 8
        (n,) = _U32.unpack_from(buf, pos)
        pos += 4
        ev = np.frombuffer(buf, _EVENT_DTYPE, count=n, offset=pos)
        msg.xs = ev["x"]
        msg.ys = ev["y"]
        msg.ts_secs = ev["secs"]
        msg.ts_nsecs = ev["nsecs"]
        msg.ps = ev["polarity"]
        return msg
    return RawMessage(type_name, buf)


def _serialize_header_msg(header):
    frame = header.frame_id.encode()
    return (struct.pack("<III", header.seq, header.stamp.secs,
                        header.stamp.nsecs)
            + _U32.pack(len(frame)) + frame)


def _serialize(msg):
    if isinstance(msg, Image):
        enc = msg.encoding.encode()
        data = bytes(msg.data)
        return (_serialize_header_msg(msg.header)
                + struct.pack("<II", msg.height, msg.width)
                + _U32.pack(len(enc)) + enc
                + struct.pack("<BI", msg.is_bigendian, msg.step)
                + _U32.pack(len(data)) + data)
    if isinstance(msg, EventArray):
        n = len(msg.xs)
        ev = np.empty(n, _EVENT_DTYPE)
        ev["x"] = msg.xs
        ev["y"] = msg.ys
        ev["secs"] = msg.ts_secs
        ev["nsecs"] = msg.ts_nsecs
        ev["polarity"] = msg.ps
        return (_serialize_header_msg(msg.header)
                + struct.pack("<III", msg.height, msg.width, n)
                + ev.tobytes())
    raise TypeError(f"cannot serialize {type(msg).__name__}")


def _connection_info(msg, topic):
    if isinstance(msg, Image):
        md5, definition = _IMAGE_MD5, _IMAGE_DEF
    else:
        md5, definition = _EVENTARRAY_MD5, _EVENTARRAY_DEF
    return [(b"topic", topic.encode()),
            (b"type", msg._type.encode()),
            (b"md5sum", md5.encode()),
            (b"message_definition", definition.encode())]


def _decompress(compression, data, size):
    if compression == "none":
        return data
    if compression == "bz2":
        return bz2.decompress(data)
    if compression == "lz4":
        try:
            import lz4.frame
        except ImportError as e:  # pragma: no cover - optional dependency
            raise RuntimeError(
                "bag uses lz4 chunk compression; the 'lz4' package is "
                "required to read it") from e
        return lz4.frame.decompress(data)
    raise ValueError(f"unknown chunk compression {compression!r}")


# ---------------------------------------------------------------------------


class Bag:
    """rosbag.Bag-compatible surface for the converters' usage patterns.

    Read: ``for topic, msg, t in Bag(path).read_messages([topics])``.
    Write: ``with Bag(path, 'w') as bag: bag.write(topic, msg, t)``.
    Messages come back in file (chunk) order, which is time order for
    sequentially recorded bags — the only kind the converters consume.
    """

    _CHUNK_TARGET = 768 * 1024  # rosbag's default chunk threshold

    def __init__(self, path, mode="r", compression="none"):
        if mode not in ("r", "w"):
            raise ValueError(f"mode must be 'r' or 'w', got {mode!r}")
        self.mode = mode
        self._compression = compression
        if mode == "w" and compression not in ("none", "bz2"):
            raise ValueError("writer supports 'none' or 'bz2' compression")
        self._file = open(path, "rb" if mode == "r" else "wb")
        if mode == "r":
            magic = self._file.read(len(_MAGIC))
            if magic != _MAGIC:
                raise ValueError(f"{path}: not a ROS bag v2.0 file")
        else:
            self._file.write(_MAGIC)
            self._write_bag_header(0, 0, 0)  # placeholder, fixed on close
            self._conns = {}           # topic -> (conn_id, header_fields)
            self._chunk = io.BytesIO()
            self._chunk_index = {}     # conn_id -> [(Time, offset)]
            self._chunk_conns = set()  # conns declared in current chunk
            self._chunk_infos = []     # (pos, start, end, {conn: count})
            self._seq = 0

    # -- read ---------------------------------------------------------------

    def read_messages(self, topics=None):
        if self.mode != "r":
            raise IOError("bag opened for writing")
        if isinstance(topics, str):
            topics = [topics]
        self._file.seek(len(_MAGIC))  # rosbag.Bag supports repeated reads
        conns = {}
        while True:
            rec = _read_record(self._file)
            if rec is None:
                return
            yield from self._dispatch(rec, conns, topics)

    def _dispatch(self, rec, conns, topics):
        header, data = rec
        op = header.get("op", b"\x00")[0]
        if op == _OP_CONNECTION:
            (cid,) = _U32.unpack(header["conn"])
            info = _parse_fields(data)
            conns[cid] = (info["topic"].decode(), info["type"].decode())
        elif op == _OP_CHUNK:
            compression = header["compression"].decode()
            (size,) = _U32.unpack(header["size"])
            inner = io.BytesIO(_decompress(compression, data, size))
            while True:
                sub = _read_record(inner)
                if sub is None:
                    break
                yield from self._dispatch(sub, conns, topics)
        elif op == _OP_MSG_DATA:
            (cid,) = _U32.unpack(header["conn"])
            topic, type_name = conns[cid]
            if topics is not None and topic not in topics:
                return
            yield topic, _deserialize(type_name, data), \
                _parse_time(header["time"])
        # index data / chunk info / bag header: sequential scan skips them

    def get_type_and_topic_info(self):
        """(types, topics) discovered by a full scan — debugging helper."""
        pos = self._file.tell()
        self._file.seek(len(_MAGIC))
        conns = {}
        while True:
            rec = _read_record(self._file)
            if rec is None:
                break
            if rec[0].get("op", b"\x00")[0] == _OP_CONNECTION:
                (cid,) = _U32.unpack(rec[0]["conn"])
                info = _parse_fields(rec[1])
                conns[cid] = (info["topic"].decode(), info["type"].decode())
        self._file.seek(pos)
        return conns

    # -- write --------------------------------------------------------------

    def _write_bag_header(self, index_pos, conn_count, chunk_count):
        header = _fields([(b"op", bytes([_OP_BAG_HEADER])),
                          (b"index_pos", _U64.pack(index_pos)),
                          (b"conn_count", _U32.pack(conn_count)),
                          (b"chunk_count", _U32.pack(chunk_count))])
        # the spec pads the bag header record out to 4096 bytes total
        pad = 4096 - 4 - len(header) - 4
        self._file.write(_U32.pack(len(header)) + header
                         + _U32.pack(pad) + b" " * pad)

    def write(self, topic, msg, t=None):
        if self.mode != "w":
            raise IOError("bag opened for reading")
        if t is None:
            t = msg.header.stamp
        if topic not in self._conns:
            cid = len(self._conns)
            self._conns[topic] = (cid, _connection_info(msg, topic))
        cid, conn_fields = self._conns[topic]
        if cid not in self._chunk_conns:
            self._chunk.write(_record(
                [(b"op", bytes([_OP_CONNECTION])),
                 (b"conn", _U32.pack(cid)), (b"topic", topic.encode())],
                _fields(conn_fields)))
            self._chunk_conns.add(cid)
        offset = self._chunk.tell()
        self._chunk.write(_record(
            [(b"op", bytes([_OP_MSG_DATA])), (b"conn", _U32.pack(cid)),
             (b"time", _time_bytes(t))], _serialize(msg)))
        self._chunk_index.setdefault(cid, []).append((t, offset))
        if self._chunk.tell() >= self._CHUNK_TARGET:
            self._flush_chunk()

    def _flush_chunk(self):
        raw = self._chunk.getvalue()
        if not raw:
            return
        pos = self._file.tell()
        payload = bz2.compress(raw) if self._compression == "bz2" else raw
        self._file.write(_record(
            [(b"op", bytes([_OP_CHUNK])),
             (b"compression", self._compression.encode()),
             (b"size", _U32.pack(len(raw)))], payload))
        counts = {}
        times = [t for entries in self._chunk_index.values()
                 for t, _ in entries]
        for cid, entries in sorted(self._chunk_index.items()):
            counts[cid] = len(entries)
            data = b"".join(_time_bytes(t) + _U32.pack(off)
                            for t, off in entries)
            self._file.write(_record(
                [(b"op", bytes([_OP_INDEX_DATA])), (b"ver", _U32.pack(1)),
                 (b"conn", _U32.pack(cid)),
                 (b"count", _U32.pack(len(entries)))], data))
        self._chunk_infos.append((pos, min(times), max(times), counts))
        self._chunk = io.BytesIO()
        self._chunk_index = {}
        self._chunk_conns = set()

    def close(self):
        if self._file.closed:
            return
        if self.mode == "w":
            self._flush_chunk()
            index_pos = self._file.tell()
            for topic, (cid, conn_fields) in self._conns.items():
                self._file.write(_record(
                    [(b"op", bytes([_OP_CONNECTION])),
                     (b"conn", _U32.pack(cid)), (b"topic", topic.encode())],
                    _fields(conn_fields)))
            for pos, start, end, counts in self._chunk_infos:
                data = b"".join(_U32.pack(cid) + _U32.pack(n)
                                for cid, n in sorted(counts.items()))
                self._file.write(_record(
                    [(b"op", bytes([_OP_CHUNK_INFO])), (b"ver", _U32.pack(1)),
                     (b"chunk_pos", _U64.pack(pos)),
                     (b"start_time", _time_bytes(start)),
                     (b"end_time", _time_bytes(end)),
                     (b"count", _U32.pack(len(counts)))], data))
            self._file.seek(len(_MAGIC))
            self._write_bag_header(index_pos, len(self._conns),
                                   len(self._chunk_infos))
        self._file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
