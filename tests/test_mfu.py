"""utils/mfu.py: XLA cost-analysis plumbing and the runner cost_analysis
surface (bench.py / tools/bench_methods.py consume these for the MFU and
roofline columns in BASELINE.md)."""

import numpy as np


def test_compiled_cost_counts_matmul_flops():
    import jax
    import jax.numpy as jnp

    from evreal_tpu.utils.mfu import compiled_cost

    n = 64
    f = jax.jit(lambda a, b: a @ b)
    a = jnp.ones((n, n), jnp.float32)
    flops, bytes_accessed = compiled_cost(f, a, a)
    assert flops is not None
    # XLA counts 2*n^3 (fma = 2) for a plain matmul
    assert abs(flops - 2 * n**3) / (2 * n**3) < 0.1, flops
    if bytes_accessed is not None:
        assert bytes_accessed >= 3 * n * n * 4  # two reads + one write


def test_compiled_cost_never_raises():
    from evreal_tpu.utils.mfu import compiled_cost

    assert compiled_cost(object()) == (None, None)


def test_mfu_fraction_uses_device_peak():
    from evreal_tpu.utils import mfu as m

    achieved, frac = m.mfu(1e12, 1.0)
    assert achieved == 1.0
    peak = m.bf16_peak_tflops()
    if peak is None:
        assert frac is None
    else:
        assert abs(frac - 1.0 / peak) < 1e-12


def test_method_runner_cost_analysis_surface():
    from evreal_tpu.harness.runner import MethodRunner
    from evreal_tpu.models import build_flagship_e2vid

    model, params = build_flagship_e2vid(seed=0)
    runner = MethodRunner(model, params, event_norm=False, post_norm="none",
                          height=32, width=48, num_bins=5, chunk_t=2)
    cap = 2048
    rng = np.random.default_rng(0)
    buffers = {
        "xs": rng.integers(0, 48, (2, cap)).astype(np.int16),
        "ys": rng.integers(0, 32, (2, cap)).astype(np.int16),
        "ts": np.sort(rng.uniform(0, 0.04, (2, cap)).astype(np.float32),
                      axis=1),
        "ps": (rng.integers(0, 2, (2, cap)) * 2 - 1).astype(np.int8),
        "count": np.full((2,), 100, np.int32)}
    state = runner.init_state()
    flops, bytes_accessed = runner.cost_analysis(state, buffers)
    assert flops is None or flops > 1e6  # a real model step has megaflops
