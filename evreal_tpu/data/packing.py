"""Pack variable-length event windows into fixed-capacity device buffers.

Windows have wildly varying event counts (dataset.py:173-184), but XLA wants
static shapes. Events for a chunk of T windows are packed into (T, E) arrays
with a per-window count; capacities are bucketed to powers of two to bound
the number of compiled program variants.

Timestamps are zero-based per window and cast to float32 *after* the shift,
preserving the reference's precision behavior (dataset.py:56).
"""

import numpy as np

_MIN_CAPACITY = 2048


def bucket_capacity(max_count, minimum=_MIN_CAPACITY):
    cap = minimum
    while cap < max_count:
        cap *= 2
    return cap


def pack_windows(seq, indices, capacity=None):
    """Pack the given window indices of a Sequence.

    Returns (buffers, metas) where buffers is a dict of numpy arrays
    {xs, ys, ts, ps: (T, E) f32; count: (T,) i32} and metas is the list of
    per-window host metadata dicts from ``seq.window``.
    """
    metas = [seq.window(i) for i in indices]
    max_count = max((m["event_count"] for m in metas), default=0)
    if capacity is None:
        capacity = bucket_capacity(max_count)
    assert capacity >= max_count, (capacity, max_count)

    t = len(indices)
    xs = np.zeros((t, capacity), np.float32)
    ys = np.zeros((t, capacity), np.float32)
    ts = np.zeros((t, capacity), np.float32)
    ps = np.zeros((t, capacity), np.float32)
    count = np.zeros((t,), np.int32)

    for row, meta in enumerate(metas):
        n = meta["event_count"]
        count[row] = n
        if n == 0:
            continue
        exs, eys, ets, eps = seq.events(meta["idx0"], meta["idx1"])
        xs[row, :n] = exs
        ys[row, :n] = eys
        ts[row, :n] = (ets - ets[0]).astype(np.float32)
        ps[row, :n] = eps

    return {"xs": xs, "ys": ys, "ts": ts, "ps": ps, "count": count}, metas
