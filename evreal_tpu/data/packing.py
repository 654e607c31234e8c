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

Three wire formats (``wire_dtypes``):

* ``f32`` (default) — the layout above; voxel timestamps bit-match the
  reference's float32 math, so golden-score files reproduce exactly.
* ``compact`` — timestamps as uint16 window-normalized fractions
  ``q = rint((ts - ts0) / dt * 65535)`` with the degenerate dt < 1e-9
  linspace (event_utils.py:48-49) encoded host-side, and uint8 coordinates
  when the sensor fits (h, w <= 255; out-of-range values park at the 255
  sentinel, which the device's bounds guard drops). 5 bytes/event on the
  wire instead of 9 — the streamed eval loop is host->device-bound on this
  tunnel, so wire bytes are throughput. Worst-case voxel perturbation is
  ~3e-5 per event weight (ops/voxelize.U16_TS_SCALE note); end-to-end score
  drift is measured in tests/test_wire_compact.py. Select with
  ``EVREAL_WIRE=compact``; the default stays f32 for strict parity.
* ``compact4`` — ONE uint32 per event (``compact4_layout``): linear pixel
  index ``y * w + x`` in the low ``idx_bits = ceil(log2(h*w + 1))`` bits
  (out-of-range events park at the ``h*w`` sentinel, which decodes to
  ``y >= h`` and is dropped by the device bounds guard), a window-normalized
  timestamp fraction in the next ``31 - idx_bits`` bits, polarity sign in
  bit 31. 4 bytes/event AND a single host->device transfer per chunk
  instead of four (the tunnel charges per array as well as per byte).
  Decoded on device in ops/voxelize.decode_compact4, where the unpacking
  fuses into the binning program. Falls back to ``compact`` dtypes when the
  sensor doesn't fit (fractional coords, or fewer than 12 timestamp bits).
  Timestamp precision at ECD scale (idx_bits 16 -> 15 ts bits) is half the
  ``compact`` wire's — still ~1e4x inside the 1e-3 parity budget
  (tests/test_wire_compact.py measures end-to-end drift for both).
"""

import os

import numpy as np

from evreal_tpu import native

_MIN_CAPACITY = 2048
U16_TS_SCALE = 65535.0


def wire_format():
    """Active wire format: ``EVREAL_WIRE`` in {f32, compact, compact4},
    default f32."""
    wire = os.environ.get("EVREAL_WIRE", "f32")
    if wire not in ("f32", "compact", "compact4"):
        raise ValueError(
            f"EVREAL_WIRE must be 'f32', 'compact' or 'compact4': {wire!r}")
    return wire


def compact4_layout(resolution):
    """(idx_bits, ts_bits) of the packed-u32 wire for this sensor, or None
    when it doesn't fit. The linear index needs ``ceil(log2(h*w + 1))``
    bits (``h*w`` itself is the out-of-range sentinel); polarity takes bit
    31; the timestamp fraction gets the rest, floored at 12 bits (worst
    t_norm quantization ~1e-3 bins at 12 — every shipped dataset config's
    sensor has >= 14)."""
    if resolution is None:
        return None
    h, w = int(resolution[0]), int(resolution[1])
    if h <= 0 or w <= 0:
        return None
    idx_bits = max(int(h * w).bit_length(), 1)  # bit_length(hw) >= log2(hw+1)
    # capped at 16: the device decode widens to the uint16 scale, so more
    # bits buy nothing (and at 16 the quantization exactly matches the
    # ``compact`` wire's)
    ts_bits = min(31 - idx_bits, 16)
    if ts_bits < 12:
        return None
    return idx_bits, ts_bits


def wire_dtypes(wire, int_coords, resolution=None):
    """Buffer dtypes for a wire format: {xs, ys, ts, ps, count}, or
    {ev, count} for an eligible ``compact4`` sensor. Build event buffers by
    iterating these keys (``alloc_buffers``), not a hard-coded list.

    ``int_coords``: whether the on-disk coordinates are integral (fractional
    BS-ERGB-style coords always travel as float32, preserving the
    truncate-toward-zero semantics on device). ``resolution``: (h, w); uint8
    coordinates need h, w <= 255 so the 255 out-of-range sentinel stays
    outside the sensor.
    """
    if wire == "compact4":
        if int_coords and compact4_layout(resolution) is not None:
            return {"ev": np.uint32, "count": np.int32}
        wire = "compact"  # graceful per-sensor fallback, like u8 coords
    xy = np.int16 if int_coords else np.float32
    ts = np.float32
    if wire == "compact":
        ts = np.uint16
        if int_coords and resolution is not None:
            h, w = resolution
            if h <= 255 and w <= 255:
                xy = np.uint8
    return {"xs": xy, "ys": xy, "ts": ts, "ps": np.int8, "count": np.int32}


def alloc_buffers(shape_prefix, capacity, dtypes, alloc=np.zeros):
    """Event-buffer dict for any wire: per-event arrays shaped
    ``shape_prefix + (capacity,)``, plus ``count`` shaped ``shape_prefix``."""
    out = {k: alloc(shape_prefix + (capacity,), d)
           for k, d in dtypes.items() if k != "count"}
    out["count"] = alloc(shape_prefix, dtypes["count"])
    return out


def polarity_bit(ps):
    """Positive-polarity bit per event, shared across wires.

    Unsigned (on-disk) polarity uses the LSB convention — identical to the
    f32/compact wires' ``(p & 1) * 2 - 1`` (reference dataset.py:227
    assumes {0,1}; a {0,255} encoding also maps correctly since
    ``255 & 1 == 1``), so every wire agrees on event sign for any uint8
    input. Signed or float input is the already-mapped ±1 convention:
    sign decides (``-1 & 1`` would misread -1 as positive)."""
    ps = np.asarray(ps)
    if np.issubdtype(ps.dtype, np.unsignedinteger):
        return (ps & 1).astype(np.uint32)
    return (ps > 0).astype(np.uint32)


def quantize_ts(ts, qmax):
    """Window-normalized timestamp quantization shared by every narrow
    wire (compact u16, compact4's ts-bits field, serve's streaming
    packer): one f64 division into the scale then per-event multiply +
    rint + clip — the exact op order the native packer implements
    (bit-identical) — with the reference's degenerate-window linspace
    (event_utils.py:48-49) quantized host-side. Returns f64 values in
    [0, qmax]; the caller casts to its wire dtype."""
    ts = np.asarray(ts, np.float64)
    n = ts.shape[0]
    if n == 0:
        return np.zeros((0,), np.float64)
    dt_w = float(ts[-1] - ts[0])
    if dt_w < 1e-9:
        return np.rint(np.arange(n) * (qmax / max(n - 1, 1)))
    return np.clip(np.rint((ts - ts[0]) * (qmax / dt_w)), 0.0, qmax)


def encode_compact4(xs, ys, ts, ps, resolution):
    """Encode one window's events as packed uint32 (see module docstring).

    ``xs/ys``: integer coordinates; ``ts``: float64 absolute or zero-based
    timestamps; ``ps``: polarity, {0,1}/{0,255} uint8 or ±1 signed
    (``polarity_bit``). Bit-identical to the native packer (same f64 op
    order: one division into the scale, then per-event multiply + rint)."""
    idx_bits, ts_bits = compact4_layout(resolution)
    h, w = int(resolution[0]), int(resolution[1])
    xs = np.asarray(xs).astype(np.int64)
    ys = np.asarray(ys).astype(np.int64)
    inb = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    idx = np.where(inb, ys * w + xs, h * w).astype(np.uint32)
    qmax = float((1 << ts_bits) - 1)
    q = quantize_ts(ts, qmax).astype(np.uint32)
    pbit = polarity_bit(ps)
    return idx | (q << np.uint32(idx_bits)) | (pbit << np.uint32(31))


def bucket_capacity(max_count, minimum=_MIN_CAPACITY):
    cap = minimum
    while cap < max_count:
        cap *= 2
    return cap


def outlier_buffers(shape_prefix, chunk_max, dtypes):
    """One-off zeroed event buffers for a chunk whose max event count
    exceeds the pool capacity chosen by ``plan_capacity`` (the rare
    escalation path shared by the single-sequence and lockstep-group
    runners). ``shape_prefix``: leading dims, e.g. ``(T,)`` or ``(N, T)``;
    ``dtypes``: per-key dtypes from ``wire_dtypes``. Returns
    ``(capacity, buffers)`` zeroed so tail slots read as no-event padding."""
    cap_c = bucket_capacity(chunk_max)
    return cap_c, alloc_buffers(shape_prefix, cap_c, dtypes)


def plan_capacity(counts, tail_frac=0.01, min_ratio=4, minimum=_MIN_CAPACITY):
    """Pool capacity robust to heavy-tailed window sizes.

    Sizing every chunk buffer to the absolute max count lets one
    pathological multi-million-event window inflate host RAM and
    host->device bytes for the whole run. Instead: let up to
    ``ceil(tail_frac * n)`` windows exceed the pool bucket — the (rare)
    chunk containing one escalates to its own bucket (one extra compiled
    program variant, H2D cost paid only for that chunk). The smaller base
    is only used when it saves at least ``min_ratio`` x capacity, so
    bucket-edge noise in a tail-free distribution never costs an extra
    compile (compiles are minutes on a cold/degraded chip) and behavior
    then stays identical to ``bucket_capacity(max(counts))``.
    """
    counts = np.sort(np.asarray(list(counts), np.int64))
    n = counts.size
    if n == 0:
        return minimum
    cap_all = bucket_capacity(int(counts[-1]), minimum)
    k = min(max(1, int(np.ceil(n * tail_frac))), n - 1)
    if k <= 0:
        return cap_all
    base = bucket_capacity(int(counts[n - 1 - k]), minimum)
    return base if cap_all >= base * min_ratio else cap_all


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


def pack_windows(seq, indices, capacity=None, out=None, metas=None,
                 out_zeroed=True, wire="f32"):
    """Pack the given window indices of a Sequence.

    Returns (buffers, metas) where buffers is a dict of numpy arrays
    {xs, ys: (T, E); ts: (T, E); ps: (T, E) i8; count: (T,) i32} with
    dtypes per ``wire_dtypes(wire, ...)``, and metas is the list of
    per-window host metadata dicts from ``seq.window``. Pass ``out`` (a
    dict of C-contiguous (T, capacity) arrays, plus ``count`` (T,)) to
    pack in place — the batched runner hands in views of its (N, T, E)
    buffers to avoid a second copy; the wire format is then inferred from
    ``out``'s dtypes. Pass ``out_zeroed=False`` when those buffers are
    reused across chunks (a buffer pool) so row tails get cleared of stale
    events (the native packer always clears tails; this flag covers the
    numpy fallback). Pass ``metas`` (the ``seq.window`` dicts for
    ``indices``, in order) to skip recomputing the window metadata the
    eval loops already hold.
    """
    if metas is None:
        metas = [seq.window(i) for i in indices]
    max_count = max((m["event_count"] for m in metas), default=0)
    if capacity is None:
        capacity = bucket_capacity(max_count)
    assert capacity >= max_count, (capacity, max_count)

    t = len(indices)
    int_coords = np.issubdtype(seq.xy.dtype, np.integer)
    resolution = getattr(seq, "sensor_resolution", None)

    native_ok = _native_eligible(seq)
    if out is None:
        dt = wire_dtypes(wire, int_coords, resolution)
        out = alloc_buffers((t,), capacity, dt,
                            alloc=np.empty if native_ok else np.zeros)
        zeroed = not native_ok
    else:
        # validate every buffer's shape, not just xs — the native packer
        # writes rows at stride `capacity` with no bounds check, so an
        # undersized ts/ps view from a stale pool would be heap corruption
        for k in out:
            if k != "count":
                assert out[k].shape == (t, capacity), (k, out[k].shape,
                                                       (t, capacity))
        assert out["count"].shape == (t,), (out["count"].shape, (t,))
        zeroed = bool(out_zeroed)

    if "ev" in out:  # packed-u32 wire
        return _pack_compact4(seq, metas, capacity, out, zeroed,
                              resolution, native_ok), metas

    compact_ts = out["ts"].dtype == np.uint16
    u8_coords = out["xs"].dtype == np.uint8
    wire = "compact" if compact_ts else "f32"
    xy_ok = np.uint8 if u8_coords else np.int16
    native_ok = native_ok and all(
        out[k].dtype == d and out[k].flags["C_CONTIGUOUS"]
        for k, d in (("xs", xy_ok), ("ys", xy_ok),
                     ("ts", np.uint16 if compact_ts else np.float32),
                     ("ps", np.int8), ("count", np.int32)))

    if native_ok:
        idx0 = np.asarray([m["idx0"] for m in metas], np.int64)
        idx1 = np.asarray([m["idx1"] for m in metas], np.int64)
        packed = (native.pack_compact(seq.t, seq.xy, seq.p, idx0, idx1,
                                      capacity, u8_coords, out)
                  if compact_ts
                  else native.pack_i16(seq.t, seq.xy, seq.p, idx0, idx1,
                                       capacity, out))
        if packed:
            return out, metas

    for row, meta in enumerate(metas):
        n = meta["event_count"]
        out["count"][row] = n
        if not zeroed:
            out["xs"][row, n:] = 0
            out["ys"][row, n:] = 0
            out["ts"][row, n:] = 0
            out["ps"][row, n:] = 0
        if n == 0:
            continue
        i0, i1 = meta["idx0"], meta["idx1"]
        xy = seq.xy[i0:i1]
        if u8_coords:
            # out-of-range values park at the 255 sentinel, which the
            # device's bounds guard drops (wire_dtypes requires h, w <= 255)
            xw, yw = xy[:, 0], xy[:, 1]
            out["xs"][row, :n] = np.where(
                (xw >= 0) & (xw < 256), xw, 255).astype(np.uint8)
            out["ys"][row, :n] = np.where(
                (yw >= 0) & (yw < 256), yw, 255).astype(np.uint8)
        else:
            out["xs"][row, :n] = xy[:, 0]
            out["ys"][row, :n] = xy[:, 1]
        ets = np.asarray(seq.t[i0:i1])
        if compact_ts:
            out["ts"][row, :n] = quantize_ts(ets, U16_TS_SCALE) \
                .astype(np.uint16)
        else:
            out["ts"][row, :n] = (ets - ets[0]).astype(np.float32)
        out["ps"][row, :n] = (
            polarity_bit(seq.p[i0:i1]).astype(np.int8) * 2 - 1)

    return out, metas


def _pack_compact4(seq, metas, capacity, out, zeroed, resolution, native_ok):
    """compact4 leg of pack_windows: native fast path, numpy fallback."""
    assert out["ev"].dtype == np.uint32 and out["count"].dtype == np.int32
    if native_ok and out["ev"].flags["C_CONTIGUOUS"]:
        idx0 = np.asarray([m["idx0"] for m in metas], np.int64)
        idx1 = np.asarray([m["idx1"] for m in metas], np.int64)
        if native.pack_compact4(seq.t, seq.xy, seq.p, idx0, idx1, capacity,
                                resolution, out):
            return out
    for row, meta in enumerate(metas):
        n = meta["event_count"]
        out["count"][row] = n
        if not zeroed:
            out["ev"][row, n:] = 0
        if n == 0:
            continue
        i0, i1 = meta["idx0"], meta["idx1"]
        xy = seq.xy[i0:i1]
        out["ev"][row, :n] = encode_compact4(
            xy[:, 0], xy[:, 1], seq.t[i0:i1], np.asarray(seq.p[i0:i1]),
            resolution)
    return out
