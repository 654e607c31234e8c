"""Pack variable-length event windows into fixed-capacity device buffers.

Windows have wildly varying event counts (dataset.py:173-184), but XLA wants
static shapes. Events for a chunk of T windows are packed into (T, E) arrays
with a per-window count; capacities are bucketed to powers of two to bound
the number of compiled program variants.

Buffers use compact dtypes — int16 coordinates, int8 polarity (±1), float32
zero-based timestamps — halving host->device bytes vs all-float32; the voxel
stage upcasts on device (free: it fuses into the binning program). Sequences
with fractional coordinates on disk (e.g. BS-ERGB subpixel, reference
tools/bs_ergb_to_npy.py:12-22) pack float32 coordinates instead, preserving
the reference's truncate-toward-zero semantics downstream.

The hot per-window loop (deinterleave xy, ±1 map, ts zero-base+narrow, tail
zeroing) runs in the native C++ packer (evreal_tpu/native/packer.cpp) when
the on-disk layout is the standard one (ts f64, xy int16, p u8); otherwise a
numpy fallback produces bit-identical buffers.

Timestamps are zero-based per window and cast to float32 *after* the shift,
preserving the reference's precision behavior (dataset.py:56).
"""

import numpy as np

from evreal_tpu import native

_MIN_CAPACITY = 2048


def bucket_capacity(max_count, minimum=_MIN_CAPACITY):
    cap = minimum
    while cap < max_count:
        cap *= 2
    return cap


def _native_eligible(seq):
    try:
        return (seq.t.dtype == np.float64 and seq.t.ndim == 1
                and seq.t.flags["C_CONTIGUOUS"]
                and seq.xy.dtype == np.int16 and seq.xy.ndim == 2
                and seq.xy.shape[1] == 2 and seq.xy.flags["C_CONTIGUOUS"]
                and seq.p.dtype == np.uint8 and seq.p.ndim == 1
                and seq.p.flags["C_CONTIGUOUS"])
    except AttributeError:
        return False


def pack_windows(seq, indices, capacity=None):
    """Pack the given window indices of a Sequence.

    Returns (buffers, metas) where buffers is a dict of numpy arrays
    {xs, ys: (T, E) i16|f32; ts: (T, E) f32; ps: (T, E) i8; count: (T,) i32}
    and metas is the list of per-window host metadata dicts from
    ``seq.window``.
    """
    metas = [seq.window(i) for i in indices]
    max_count = max((m["event_count"] for m in metas), default=0)
    if capacity is None:
        capacity = bucket_capacity(max_count)
    assert capacity >= max_count, (capacity, max_count)

    t = len(indices)
    int_coords = np.issubdtype(seq.xy.dtype, np.integer)
    xy_dtype = np.int16 if int_coords else np.float32

    if _native_eligible(seq):
        buffers = {"xs": np.empty((t, capacity), np.int16),
                   "ys": np.empty((t, capacity), np.int16),
                   "ts": np.empty((t, capacity), np.float32),
                   "ps": np.empty((t, capacity), np.int8),
                   "count": np.empty((t,), np.int32)}
        idx0 = np.asarray([m["idx0"] for m in metas], np.int64)
        idx1 = np.asarray([m["idx1"] for m in metas], np.int64)
        if native.pack_i16(seq.t, seq.xy, seq.p, idx0, idx1, capacity,
                           buffers):
            return buffers, metas

    xs = np.zeros((t, capacity), xy_dtype)
    ys = np.zeros((t, capacity), xy_dtype)
    ts = np.zeros((t, capacity), np.float32)
    ps = np.zeros((t, capacity), np.int8)
    count = np.zeros((t,), np.int32)

    for row, meta in enumerate(metas):
        n = meta["event_count"]
        count[row] = n
        if n == 0:
            continue
        i0, i1 = meta["idx0"], meta["idx1"]
        xy = seq.xy[i0:i1]
        xs[row, :n] = xy[:, 0]
        ys[row, :n] = xy[:, 1]
        ets = np.asarray(seq.t[i0:i1])
        ts[row, :n] = (ets - ets[0]).astype(np.float32)
        ps[row, :n] = (np.asarray(seq.p[i0:i1]).astype(np.int8) & 1) * 2 - 1

    return {"xs": xs, "ys": ys, "ts": ts, "ps": ps, "count": count}, metas
