"""Native (C++) runtime components, loaded through ctypes.

Components: the fused event-window packer (packer.cpp — the hot host-side
loop of the data layer) and the sliding-histogram disk rank-equalize
(histeq.cpp — the hot loop of ``histeq=local`` post-processing). All
sources compile on first use with the system C++ compiler into
``_native.so`` next to the sources; if compilation fails (no compiler,
read-only tree) every caller falls back to its pure-numpy implementation
transparently.

``EVREAL_NATIVE=0`` disables the native path.
"""

import ctypes
import os
import subprocess
import tempfile

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_DIR, "packer.cpp"), os.path.join(_DIR, "histeq.cpp")]
_LIB = os.path.join(_DIR, "_native.so")

_lib = "unset"


def _build():
    if (os.path.exists(_LIB)
            and all(os.path.getmtime(_LIB) >= os.path.getmtime(s)
                    for s in _SRCS)):
        return _LIB
    for cxx in ("g++", "c++", "clang++"):
        tmp = None
        try:
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
            os.close(fd)
            subprocess.run(
                [cxx, "-O3", "-shared", "-fPIC", "-std=c++17", *_SRCS,
                 "-o", tmp],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, _LIB)
            return _LIB
        except (OSError, subprocess.SubprocessError):
            if tmp and os.path.exists(tmp):
                os.unlink(tmp)
            continue
    return None


def load():
    """The native library, or None if unavailable/disabled."""
    global _lib
    if _lib == "unset":
        _lib = None
        if os.environ.get("EVREAL_NATIVE", "1") != "0":
            path = _build()
            if path is not None:
                try:
                    lib = ctypes.CDLL(path)
                    lib.evreal_pack_i16.restype = ctypes.c_int
                    lib.evreal_pack_compact.restype = ctypes.c_int
                    lib.evreal_pack_compact4.restype = ctypes.c_int
                    lib.evreal_rank_equalize.restype = ctypes.c_int
                    _lib = lib
                except OSError:
                    _lib = None
    return _lib


def pack_i16(ts, xy, p, idx0, idx1, capacity, out):
    """Fused pack of event windows. Arrays must be C-contiguous with dtypes
    ts f64, xy int16 (N,2), p u8; ``out`` holds preallocated (T, capacity)
    buffers {ts f32, xs/ys int16, ps int8, count int32}. Returns True on
    success (False -> caller should use the numpy fallback)."""
    lib = load()
    if lib is None:
        return False
    t_rows = len(idx0)
    idx0 = idx0.astype(ctypes.c_int64, copy=False)
    idx1 = idx1.astype(ctypes.c_int64, copy=False)
    rc = lib.evreal_pack_i16(
        ctypes.c_void_p(ts.ctypes.data), ctypes.c_void_p(xy.ctypes.data),
        ctypes.c_void_p(p.ctypes.data), ctypes.c_int64(len(ts)),
        ctypes.c_void_p(idx0.ctypes.data), ctypes.c_void_p(idx1.ctypes.data),
        ctypes.c_int64(t_rows), ctypes.c_int64(capacity),
        ctypes.c_void_p(out["ts"].ctypes.data),
        ctypes.c_void_p(out["xs"].ctypes.data),
        ctypes.c_void_p(out["ys"].ctypes.data),
        ctypes.c_void_p(out["ps"].ctypes.data),
        ctypes.c_void_p(out["count"].ctypes.data))
    if rc != 0:
        raise ValueError("evreal_pack_i16: window exceeds capacity or bounds")
    return True


def pack_compact(ts, xy, p, idx0, idx1, capacity, u8_coords, out):
    """Compact-wire fused pack (see pack_i16 for the array contract).
    ``out`` holds (T, capacity) buffers {ts u16, xs/ys u8|i16 per
    ``u8_coords``, ps i8, count i32}. Returns True on success (False ->
    caller should use the numpy fallback)."""
    lib = load()
    if lib is None:
        return False
    t_rows = len(idx0)
    idx0 = idx0.astype(ctypes.c_int64, copy=False)
    idx1 = idx1.astype(ctypes.c_int64, copy=False)
    rc = lib.evreal_pack_compact(
        ctypes.c_void_p(ts.ctypes.data), ctypes.c_void_p(xy.ctypes.data),
        ctypes.c_void_p(p.ctypes.data), ctypes.c_int64(len(ts)),
        ctypes.c_void_p(idx0.ctypes.data), ctypes.c_void_p(idx1.ctypes.data),
        ctypes.c_int64(t_rows), ctypes.c_int64(capacity),
        ctypes.c_int(1 if u8_coords else 0),
        ctypes.c_void_p(out["ts"].ctypes.data),
        ctypes.c_void_p(out["xs"].ctypes.data),
        ctypes.c_void_p(out["ys"].ctypes.data),
        ctypes.c_void_p(out["ps"].ctypes.data),
        ctypes.c_void_p(out["count"].ctypes.data))
    if rc != 0:
        raise ValueError(
            "evreal_pack_compact: window exceeds capacity or bounds")
    return True


def pack_compact4(ts, xy, p, idx0, idx1, capacity, resolution, out):
    """Packed-u32 wire fused pack (see pack_i16 for the array contract).
    ``out`` holds {ev: (T, capacity) u32, count: (T,) i32}; ``resolution``
    is the (h, w) that defines the index/timestamp bit split
    (packing.compact4_layout). Returns True on success (False -> caller
    should use the numpy fallback)."""
    from evreal_tpu.data.packing import compact4_layout

    lib = load()
    if lib is None:
        return False
    layout = compact4_layout(resolution)
    if layout is None:
        return False
    idx_bits, ts_bits = layout
    t_rows = len(idx0)
    idx0 = idx0.astype(ctypes.c_int64, copy=False)
    idx1 = idx1.astype(ctypes.c_int64, copy=False)
    rc = lib.evreal_pack_compact4(
        ctypes.c_void_p(ts.ctypes.data), ctypes.c_void_p(xy.ctypes.data),
        ctypes.c_void_p(p.ctypes.data), ctypes.c_int64(len(ts)),
        ctypes.c_void_p(idx0.ctypes.data), ctypes.c_void_p(idx1.ctypes.data),
        ctypes.c_int64(t_rows), ctypes.c_int64(capacity),
        ctypes.c_int64(int(resolution[0])), ctypes.c_int64(int(resolution[1])),
        ctypes.c_int(idx_bits), ctypes.c_int(ts_bits),
        ctypes.c_void_p(out["ev"].ctypes.data),
        ctypes.c_void_p(out["count"].ctypes.data))
    if rc != 0:
        raise ValueError(
            "evreal_pack_compact4: window exceeds capacity or bounds")
    return True


def rank_equalize(u8_img, radius):
    """Disk rank-equalize of a C-contiguous uint8 (H, W) image. Returns the
    uint8 result, or None -> caller should use the Python fallback."""
    import numpy as np

    lib = load()
    if lib is None:
        return None
    if (u8_img.dtype != np.uint8 or u8_img.ndim != 2
            or not u8_img.flags["C_CONTIGUOUS"]):
        return None
    out = np.empty_like(u8_img)
    rc = lib.evreal_rank_equalize(
        ctypes.c_void_p(u8_img.ctypes.data),
        ctypes.c_int64(u8_img.shape[0]), ctypes.c_int64(u8_img.shape[1]),
        ctypes.c_int64(radius), ctypes.c_void_p(out.ctypes.data))
    if rc != 0:
        return None
    return out
