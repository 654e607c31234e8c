"""Pallas TPU kernel for event voxelization.

Same math as ops.voxelize.voxelize_matmul (one-hot matmul scatter, reference
semantics of EVREAL utils/event_utils.py:27-59), but the one-hot factors are
generated *inside* VMEM per event chunk and fed straight to the MXU, with the
(num_bins*H, W) accumulator resident in VMEM across the whole grid — no HBM
round-trips for intermediates.

Grid: one program per chunk of events. Inputs are the precomputed per-event
(row_lo, row_hi, w_lo, w_hi, col) streams (cheap elementwise prep shared with
the jnp paths).

Measured on v5e at ECD scale (30k events, 180x240, 5 bins): 22 Mev/s
single-window vs the XLA one-hot matmul's 25 Mev/s (129 Mev/s batched over
32 windows, ~93% of MXU peak at Precision.HIGH). The kernel lowers and runs
on real TPU *unbatched*; under jax.vmap the auto-batched 1-D block shapes
violate Mosaic's (8, 128) tiling rule, so the batched eval pipeline uses
ops.voxelize.voxelize_matmul, which XLA fuses equivalently.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from evreal_tpu.ops.voxelize import _event_rows_cols

DEFAULT_CHUNK = 1024


def _kernel(rows_lo_ref, rows_hi_ref, wlo_ref, whi_ref, cols_ref, out_ref,
            acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    chunk = rows_lo_ref.shape[0]
    bh = acc_ref.shape[0]
    w = acc_ref.shape[1]
    rl = rows_lo_ref[:]
    rh = rows_hi_ref[:]
    wlo = wlo_ref[:]
    whi = whi_ref[:]
    cols = cols_ref[:]

    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, bh), 1)
    cols_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, w), 1)
    oh_rows = ((rows_iota == rl[:, None]).astype(jnp.float32) * wlo[:, None]
               + (rows_iota == rh[:, None]).astype(jnp.float32)
               * whi[:, None])
    oh_cols = (cols_iota == cols[:, None]).astype(jnp.float32)
    acc_ref[:] += jax.lax.dot_general(
        oh_rows, oh_cols,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def voxelize_pallas(xs, ys, ts, ps, count, num_bins, sensor_size,
                    chunk=DEFAULT_CHUNK, interpret=False):
    """Drop-in for ops.voxelize.voxelize_matmul. Returns (B, H, W) f32."""
    h, w = sensor_size
    e = xs.shape[0]
    if e == 0:  # zero-capacity buffer: _t_norm would index ts[0]
        return jnp.zeros((num_bins, h, w), jnp.float32)
    row_lo, row_hi, w_lo, w_hi, cols = _event_rows_cols(
        xs, ys, ts, ps, count, num_bins, h, w)

    chunk = min(chunk, e)
    n_chunks = -(-e // chunk)
    pad = n_chunks * chunk - e

    def prep(a, dtype):
        a = a.astype(dtype)
        if pad:
            a = jnp.pad(a, (0, pad))
        return a

    args = (prep(row_lo, jnp.int32), prep(row_hi, jnp.int32),
            prep(w_lo, jnp.float32), prep(w_hi, jnp.float32),
            prep(cols, jnp.int32))

    bh = num_bins * h
    out = pl.pallas_call(
        _kernel,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((chunk,), lambda i: (i,),
                               memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec((bh, w), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bh, w), jnp.float32)],
        interpret=interpret,
    )(*args)
    return out.reshape(num_bins, h, w)


@functools.partial(jax.jit, static_argnames=("num_bins", "sensor_size",
                                             "interpret"))
def voxelize(xs, ys, ts, ps, count, num_bins=5, sensor_size=(180, 240),
             interpret=False):
    return voxelize_pallas(xs, ys, ts, ps, count, num_bins, sensor_size,
                           interpret=interpret)


# ---------------------------------------------------------------------------
# batched (whole-chunk) kernel
# ---------------------------------------------------------------------------

_TW = 8  # windows per grid step (sublane-aligned for the (8,128) f32 tile)


def _window_tile(bh, w, budget=8 * 1024 * 1024, max_tw=_TW):
    """Windows per grid step for the batched kernel: the (tw, bh, w) f32
    output block stays resident in VMEM, so shrink tw for large sensors
    (MVSEC 346x260 at tw=8 is ~14.4 MB — over the ~16 MB VMEM once one-hot
    temporaries are added). ~8 MB budget, floor 1."""
    tw = max_tw
    while tw > 1 and tw * bh * w * 4 > budget:
        tw //= 2
    return tw


def _batched_kernel(rows_lo_ref, rows_hi_ref, wlo_ref, whi_ref, cols_ref,
                    out_ref):
    """Grid (T//_TW, n_chunks); event chunks are the innermost dimension, so
    the (TW, B*H, W) output block stays resident in VMEM and serves as the
    accumulator across chunks (no separate scratch -> fits comfortably in
    VMEM: ~7 MB out block + ~2 MB one-hot temporaries at chunk=512)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    chunk = rows_lo_ref.shape[1]
    bh = out_ref.shape[1]
    w = out_ref.shape[2]
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, bh), 1)
    cols_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, w), 1)
    for t in range(rows_lo_ref.shape[0]):  # static unroll: tw dots/step
        rl = rows_lo_ref[t, :]
        rh = rows_hi_ref[t, :]
        oh_rows = ((rows_iota == rl[:, None]).astype(jnp.float32)
                   * wlo_ref[t, :][:, None]
                   + (rows_iota == rh[:, None]).astype(jnp.float32)
                   * whi_ref[t, :][:, None])
        oh_cols = (cols_iota == cols_ref[t, :][:, None]).astype(jnp.float32)
        # Mosaic only lowers DEFAULT/HIGHEST dot precisions (HIGH raises
        # NotImplementedError); HIGHEST matches the original kernel.
        out_ref[t] += jax.lax.dot_general(
            oh_rows, oh_cols,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )


def voxelize_pallas_windows(xs, ys, ts, ps, count, num_bins, sensor_size,
                            chunk=512, interpret=False):
    """Voxelize a whole chunk of T windows in one kernel launch.

    Inputs are the packed (T, E) buffers (any of int16/int8/f32 as emitted
    by data/packing.py); returns (T, num_bins, H, W) f32. This is the
    batch-capable variant of ``voxelize_pallas`` — jax.vmap of a 1-D Pallas
    kernel does not lower on TPU (auto-batched block shapes violate the
    (8, 128) tiling rule), so the window axis is part of the grid instead.
    """
    h, w = sensor_size
    t_n, e = xs.shape
    ps = ps.astype(jnp.float32)
    if ts.dtype != jnp.uint16:  # compact wire: dtype carries semantics
        ts = ts.astype(jnp.float32)  # (ops/voxelize._t_norm)

    def prep_one(x, y, t, p, c):
        return _event_rows_cols(x, y, t, p, c, num_bins, h, w)

    if e == 0:  # zero-capacity buffers: _t_norm would index ts[0]
        return jnp.zeros((t_n, num_bins, h, w), jnp.float32)
    row_lo, row_hi, w_lo, w_hi, cols = jax.vmap(prep_one)(xs, ys, ts, ps,
                                                          count)

    bh = num_bins * h
    tw = _window_tile(bh, w)

    chunk = min(chunk, e)
    n_chunks = -(-e // chunk)
    pad_e = n_chunks * chunk - e
    pad_t = (-t_n) % tw

    def pad2(a):
        if pad_t or pad_e:
            a = jnp.pad(a, ((0, pad_t), (0, pad_e)))
        return a

    args = tuple(map(pad2, (row_lo, row_hi, w_lo, w_hi, cols)))
    tp = t_n + pad_t

    out = pl.pallas_call(
        _batched_kernel,
        grid=(tp // tw, n_chunks),
        in_specs=[pl.BlockSpec((tw, chunk), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec((tw, bh, w), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, bh, w), jnp.float32),
        interpret=interpret,
    )(*args)
    return out[:t_n].reshape(t_n, num_bins, h, w)


voxelize_pallas_windows.windows_batched = True
