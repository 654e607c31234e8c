"""Input / output normalizations (device-side).

  * ``normalize_event_tensor`` — zero-mean/unit-std over the *nonzero* entries
    of a voxel tensor (reference eval.py:398-410; used by E2VID & FireNet).
  * ``post_process_normalization`` — none / robust (1-99 pct) / standard
    (0-100 pct) / exprobust image normalization (reference eval.py:380-395,
    utils/eval_utils.py:15-35). Percentiles use numpy's default linear
    interpolation, which ``jnp.percentile`` matches.
"""

import os

import jax.numpy as jnp


def normalize_event_tensor(voxel):
    nonzero = voxel != 0
    num = jnp.sum(nonzero).astype(voxel.dtype)
    safe = jnp.maximum(num, 1)
    mean = jnp.sum(voxel) / safe
    var = jnp.sum(voxel * voxel) / safe - mean * mean
    # E[x^2] - mean^2 can round a hair negative in f32 (e.g. all-equal
    # nonzero entries from a constant-polarity sparse window), and
    # sqrt(negative) -> NaN propagates through maximum() and poisons the
    # whole recurrent reconstruction. Clamp at 0: behavior changes only
    # where the reference itself emits NaN (torch NaNs on the same input
    # — deliberate strictly-better divergence).
    std = jnp.maximum(jnp.sqrt(jnp.maximum(var, 0.0)),
                      jnp.asarray(1e-6, voxel.dtype))
    out = jnp.where(nonzero, (voxel - mean) / std, 0.0)
    return jnp.where(num > 0, out, voxel)


def robust_normalize(img, q_min, q_max):
    flat = img.ravel()
    pct = os.environ.get("EVREAL_PCT", "bits")
    if pct not in ("bits", "sort"):
        # loud validation, like every other EVREAL_* knob: a typo silently
        # selecting the default would corrupt an A/B conclusion
        raise ValueError(f"EVREAL_PCT={pct!r}: expected bits|sort")
    if pct == "sort":
        # reference-shaped lowering (full per-frame lax.sort) — kept as an
        # A/B control; same order stats as the default, lerp differs only
        # by XLA FMA contraction (~1 ulp)
        lo = jnp.percentile(flat, q_min)
        hi = jnp.percentile(flat, q_max)
    else:
        from evreal_tpu.ops.percentile import percentiles

        # sort-free exact percentiles (ops/percentile.py): same bits,
        # ~30% of the b128 lockstep frame time back (BASELINE.md)
        lo, hi = percentiles(flat, (q_min, q_max))
    return (img - lo) / (hi - lo)


def post_process_normalization(img, norm):
    if norm == "robust":
        return robust_normalize(img, 1, 99)
    if norm == "standard":
        return robust_normalize(img, 0, 100)
    if norm == "exprobust":
        return robust_normalize(jnp.exp(img), 1, 99)
    if norm == "none" or norm is None:
        return img
    raise ValueError(f"Unrecognized normalization argument: {norm}")
