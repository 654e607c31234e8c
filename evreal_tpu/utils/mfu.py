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


def mfu(flops, seconds, device=None):
    """(achieved_tflops_per_s, fraction_of_bf16_peak | None)."""
    achieved = flops / seconds / 1e12
    peak = bf16_peak_tflops(device)
    return achieved, (achieved / peak if peak else None)
