"""Exact percentiles without sorting — radix bisection on f32 bit keys.

The reference's robust post-norm takes 1%/99% percentiles per frame
(utils/eval_utils.py:15-20 via np.percentile). ``jnp.percentile`` lowers to
a full per-frame ``lax.sort`` — measured at **304 us/frame, 30% of the whole
b128 bf16 lockstep pipeline** at ECD scale (BASELINE.md), on a chip showing
2% MXU / 2% HBM utilization for the same program: XLA's TPU sort is a
many-pass sorting network, the one O(n log^2 n) stage in an otherwise
linear pipeline.

A percentile only needs two order statistics. This module finds the k-th
smallest element exactly in 32 fused compare-count passes (O(n) each, no
materialized intermediates) by bisecting on the *bit pattern*:

  * f32 totally orders under the standard order-preserving uint32 key
    transform (sign-magnitude -> biased): negative floats map reversed to
    [0, 2^31), non-negative shift up to [2^31, 2^32). +-0.0, +-inf keep
    lax.sort's exact total order.
  * 32 rounds of branch-free binary search on the key value ("is the k-th
    key <= mid?" == "count(keys <= mid) >= k+1") pin the k-th key exactly —
    integer bisection cannot suffer float-midpoint stagnation, and all
    requested ranks share each round's single pass over the data.

Semantics: linear-interpolation percentiles with bit-exact order
statistics (asserted against lax.sort), any-NaN -> NaN (matching
numpy/jnp), and rank/weight arithmetic done statically in float64 —
numpy-exact, and *more* accurate than jnp.percentile, whose traced f32
rank chain plus XLA's divide->reciprocal rewrite perturbs the executed
weights by 1-2 ulps per backend/fusion context (measured; see
_rank_weights). Differences from jnp.percentile are bounded by that
weight wobble times the local order-stat gap — order-of 1e-6 relative on
real images, far inside the harness's 2e-4 golden tolerances.
tests/test_percentile.py asserts all of this. Static ranks only (q and
the element count are trace-time constants here — image shapes are
static under jit).
"""

import numpy as np

import jax.numpy as jnp
from jax import lax


def _rank_weights(q, n):
    """Rank arithmetic for scalar percentile q of n elements:
    (low_rank, high_rank, low_weight, high_weight).

    Computed statically in float64 — numpy-exact (the reference's
    np.percentile does its rank math in doubles, eval_utils.py:15-20) and
    strictly more accurate than jnp.percentile's traced f32 chain, whose
    executed weights additionally wobble 1-2 ulps with XLA's
    divide-by-constant -> reciprocal-multiply rewrite (measured: effective
    high-weight 0.0199585 on CPU for q=99, n=999, vs 0.02 true)."""
    rf = q / 100.0 * (n - 1)
    low = np.floor(rf)
    high = np.ceil(rf)
    hw = np.float32(rf - low)
    lw = np.float32(np.float64(1.0) - np.float64(rf - low))
    clamp = lambda r: int(min(max(r, 0.0), float(n - 1)))
    return clamp(low), clamp(high), lw, hw


def _f32_keys(x):
    """Order-preserving uint32 keys of an f32 array (lax.sort total order:
    -inf < ... < -0.0 < +0.0 < ... < +inf; NaN never reaches here)."""
    u = lax.bitcast_convert_type(x, jnp.uint32)
    sign = u & jnp.uint32(0x80000000)
    return jnp.where(sign != 0, ~u, u | jnp.uint32(0x80000000))


def _keys_to_f32(keys):
    u = jnp.where(keys & jnp.uint32(0x80000000) != 0,
                  keys & jnp.uint32(0x7FFFFFFF), ~keys)
    return lax.bitcast_convert_type(u, jnp.float32)


def order_stats(x, ks):
    """Exact order statistics of flat f32 ``x``: the ks[i]-th smallest
    element (0-indexed, lax.sort total order), without sorting.

    ``ks``: static tuple of ints. Returns an (len(ks),) f32 array.
    """
    if x.ndim != 1:
        raise ValueError(f"order_stats wants a flat array, got {x.shape}")
    x = x.astype(jnp.float32)
    y = _f32_keys(x)
    k_arr = jnp.asarray(ks, jnp.int32)

    def body(_, lh):
        lo, hi = lh
        mid = lo + ((hi - lo) >> jnp.uint32(1))
        # one fused pass over y counts all ranks' thresholds together
        c = jnp.sum((y[:, None] <= mid[None, :]).astype(jnp.int32), axis=0)
        pred = c >= k_arr + 1  # k-th smallest key is <= mid
        return jnp.where(pred, lo, mid + jnp.uint32(1)), \
            jnp.where(pred, mid, hi)

    lo0 = jnp.zeros((len(ks),), jnp.uint32)
    hi0 = jnp.full((len(ks),), 0xFFFFFFFF, jnp.uint32)
    lo, _ = lax.fori_loop(0, 32, body, (lo0, hi0))
    return _keys_to_f32(lo)


def percentiles(x, qs):
    """``jnp.percentile(x, q, method='linear')`` for each static q in
    ``qs`` on flat f32 ``x``, with no sort: the order statistics are
    bit-identical to ``lax.sort``'s total order, and the linear
    interpolation uses f64-static numpy-exact weights — within a few ulps
    of jnp.percentile, whose executed weights themselves wobble 1-2 ulps
    under XLA's divide->reciprocal rewrite (module docstring). Returns a
    (len(qs),) f32 array."""
    if x.ndim != 1:
        # validate on EVERY path: the min/max shortcut would otherwise
        # silently use n = shape[0] (H, not H*W) while the bisection path
        # raises — same input, path-dependent behavior
        raise ValueError(f"percentiles expects flat input, got {x.shape}")
    n = x.shape[0]
    plans = [_rank_weights(q, n) for q in qs]
    if all(lw == 1.0 and k0 == k1 and k0 in (0, n - 1)
           for k0, k1, lw, _ in plans):
        # min/max only (the 'standard' 0/100 post-norm): skip the
        # bisection. Reduced in key space — uint32 min/max of monotone
        # keys preserves bits (f32 min/max would flush denormals and
        # lose -0.0 vs +0.0 under XLA)
        y = _f32_keys(x.astype(jnp.float32))
        stats = {0: _keys_to_f32(jnp.min(y))}
        if n > 1:
            stats[n - 1] = _keys_to_f32(jnp.max(y))
    else:
        ks = sorted({k for k0, k1, _, _ in plans for k in (k0, k1)})
        vals = order_stats(x, tuple(ks))
        stats = {k: vals[i] for i, k in enumerate(ks)}
    # hw == 0 (integer rank, e.g. q=0/50/100 at odd n): take the order
    # stat directly — no lerp, so an infinite stat stays inf instead of
    # the inf*0 -> NaN both numpy's and jnp's a*lw+b*hw form produce
    outs = [stats[k0] if hw == 0.0 else stats[k0] * lw + stats[k1] * hw
            for k0, k1, lw, hw in plans]
    out = jnp.stack(outs)
    # jnp.percentile: any NaN anywhere -> NaN result (reductions._quantile
    # floods the array with NaN before sorting)
    return jnp.where(jnp.isnan(x).any(), jnp.float32(jnp.nan), out)
