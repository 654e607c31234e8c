"""Native (C++) runtime components, loaded through ctypes.

The only component so far is the fused event-window packer (packer.cpp) —
the hot host-side loop of the data layer. It is compiled on first use with
the system C++ compiler into ``_packer.so`` next to the source; if
compilation fails (no compiler, read-only tree) everything falls back to the
pure-numpy implementation in ``evreal_tpu.data.packing`` transparently.

``EVREAL_NATIVE=0`` disables the native path.
"""

import ctypes
import os
import subprocess
import tempfile

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "packer.cpp")
_LIB = os.path.join(_DIR, "_packer.so")

_lib = "unset"


def _build():
    if (os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    for cxx in ("g++", "c++", "clang++"):
        tmp = None
        try:
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
            os.close(fd)
            subprocess.run(
                [cxx, "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
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
    """The packer library, or None if unavailable/disabled."""
    global _lib
    if _lib == "unset":
        _lib = None
        if os.environ.get("EVREAL_NATIVE", "1") != "0":
            path = _build()
            if path is not None:
                try:
                    lib = ctypes.CDLL(path)
                    lib.evreal_pack_i16.restype = ctypes.c_int
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
