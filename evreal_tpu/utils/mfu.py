"""MFU accounting: XLA-estimated FLOPs of a compiled program vs device peak.

The number that proves "actually fast, not just correct" (reference
counterpart: the CudaTimer ms/frame table, utils/timers.py:28-37, which has
no efficiency denominator). Peaks are the scaling-book per-chip bf16
systolic-array figures; bf16 peak is the honest denominator even for
f32-precision pipelines (the hardware ceiling doesn't move because the
program asks for more precise passes).
"""

BF16_PEAK_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v5": 459.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
}


def bf16_peak_tflops(device=None):
    """Peak for the (default) device, or None for an unknown kind."""
    import jax

    if device is None:
        device = jax.devices()[0]
    return BF16_PEAK_TFLOPS.get(getattr(device, "device_kind", None))


def compiled_cost(jitted, *args, **kwargs):
    """(flops, bytes_accessed) XLA estimates for one call of a jitted
    function at these arguments; either may be None when cost analysis is
    unavailable (best-effort: interpreters/older backends may not expose
    it). bytes_accessed is XLA's HBM-traffic estimate — flops/bytes is the
    program's operational intensity, which classifies it against the
    device ridge point (peak_flops/peak_bw ~ 240 FLOP/B on v5e bf16)."""
    try:
        cost = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return (float(cost.get("flops", 0.0)) or None,
                float(cost.get("bytes accessed", 0.0)) or None)
    except Exception:  # noqa: BLE001 — diagnostics must never break a bench
        return None, None


def _sds(a):
    """Leaf -> ShapeDtypeStruct without touching data (device arrays stay
    on device; ShapeDtypeStructs pass through)."""
    import jax
    import numpy as np

    if isinstance(a, jax.ShapeDtypeStruct):
        return a
    return jax.ShapeDtypeStruct(np.shape(a), np.result_type(a))


def component_cost(fn, *args):
    """(flops, bytes_accessed) of ``fn`` at the shapes/dtypes of ``args``,
    compiled on the host CPU backend.

    Cost analysis is an HLO-level estimate dominated by dot/conv terms, so
    the backend choice barely moves it — and compiling the diagnostic on
    CPU means it never costs a chip compile (30 s+ through the tunnel) or
    touches a possibly-degraded backend. ``args`` may be arrays, pytrees,
    or ShapeDtypeStructs; data is never read."""
    import jax

    try:
        cpu = jax.devices("cpu")[0]
        structs = jax.tree.map(_sds, args)
        with jax.default_device(cpu):
            return compiled_cost(jax.jit(fn), *structs)
    except Exception:  # noqa: BLE001 — diagnostics must never break a bench
        return None, None


def composed_cost(parts):
    """Trip-count-aware program cost: sum of component costs x trip counts.

    XLA's cost_analysis counts a ``while`` body ONCE, not x trip-count, so
    a compiled program with loops (lax.scan / lax.while_loop) undercounts —
    measured 10-25x low on the chunked eval pipeline vs the profiler's
    per-kernel roofline (BASELINE.md "MFU accounting"). Callers split the
    program into loop-free components (vmap is fine: it widens the body,
    which cost_analysis prices correctly) and pass
    ``[(fn, args, trip_count), ...]``. Returns (flops, bytes); flops is
    None when any component's figure is unavailable, bytes additionally
    when any backend omits it."""
    flops, bytes_ = 0.0, 0.0
    for fn, args, mult in parts:
        f, b = component_cost(fn, *args)
        if f is None:
            return None, None
        flops += f * mult
        bytes_ = None if (bytes_ is None or b is None) else bytes_ + b * mult
    return flops, bytes_


def mfu(flops, seconds, device=None):
    """(achieved_tflops_per_s, fraction_of_bf16_peak | None)."""
    achieved = flops / seconds / 1e12
    peak = bf16_peak_tflops(device)
    return achieved, (achieved / peak if peak else None)
