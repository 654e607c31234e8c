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


def _buffers(t, cap, h, w, counts):
    rng = np.random.default_rng(0)
    ts = np.sort(rng.uniform(0, 0.04, (t, cap)).astype(np.float32), axis=1)
    return {
        "xs": rng.integers(0, w, (t, cap)).astype(np.int16),
        "ys": rng.integers(0, h, (t, cap)).astype(np.int16),
        "ts": ts - ts[:, :1],
        "ps": (rng.integers(0, 2, (t, cap)) * 2 - 1).astype(np.int8),
        "count": np.full((t,), counts, np.int32)}


def test_cost_analysis_is_trip_count_aware():
    """The composed per-chunk cost must match a fully-unrolled loop-free
    chunk program (the gold standard), and exceed the compiled looped
    program's own cost_analysis — XLA counts ``while`` bodies once, which
    undercut the real pipeline's FLOPs 10-25x (the round-3 MFU bug)."""
    import jax
    import jax.numpy as jnp

    from evreal_tpu.harness.runner import (
        MethodRunner,
        loop_free_voxelize_fn,
        make_voxel_stage,
        matmul_precision_ctx,
    )
    from evreal_tpu.models import build_flagship_e2vid
    from evreal_tpu.ops.normalize import post_process_normalization
    from evreal_tpu.utils.mfu import compiled_cost, component_cost

    t, h, w, cap = 3, 32, 48, 8192  # cap = 2 event-chunk scan trips
    model, params = build_flagship_e2vid(seed=0)
    runner = MethodRunner(model, params, event_norm=True, post_norm="robust",
                          height=h, width=w, num_bins=5, chunk_t=t)
    buffers = _buffers(t, cap, h, w, counts=6000)
    state = runner.init_state()
    flops, _ = runner.cost_analysis(state, buffers)
    assert flops is not None

    crop, dtype = runner.crop, runner.dtype
    stage = make_voxel_stage(loop_free_voxelize_fn("matmul"), 5, (h, w),
                             True, out_dtype=dtype)

    def gold(params, st, bufs):  # runner._build, Python-unrolled
        with matmul_precision_ctx(dtype):
            vox = crop.pad(stage(bufs))
            imgs = []
            for i in range(t):
                out, st = model.apply(params, st, vox[i][None])
                imgs.append(out["image"][0])
            x = crop.crop(jnp.stack(imgs).astype(jnp.float32))[..., 0]
            x = jax.vmap(lambda im: post_process_normalization(
                im, "robust"))(x)
            return st, x, jnp.clip(x, 0.0, 1.0)

    gold_flops, _ = component_cost(gold, runner._params_cast, state, buffers)
    assert gold_flops is not None
    assert abs(flops - gold_flops) / gold_flops < 0.15, (flops, gold_flops)

    looped_flops, _ = compiled_cost(runner._build(), runner._params_cast,
                                    state, buffers)
    if looped_flops:
        assert flops > 1.5 * looped_flops, (flops, looped_flops)


def test_batched_cost_analysis_scales_with_batch():
    from evreal_tpu.harness.batched import BatchedRunner
    from evreal_tpu.models import build_flagship_e2vid

    t, h, w, cap = 2, 32, 48, 4096
    model, params = build_flagship_e2vid(seed=0)
    flops_by_n = {}
    for n in (1, 2):
        r = BatchedRunner(model, params, event_norm=True, post_norm="none",
                          height=h, width=w, num_bins=5, n=n, chunk_t=t)
        one = _buffers(t, cap, h, w, counts=3000)
        bufs = {k: np.stack([v] * n) for k, v in one.items()}
        flops_by_n[n], _ = r.cost_analysis(r.init_state(), bufs)
        assert flops_by_n[n] is not None
    # conv/voxel FLOPs are linear in the lockstep batch
    ratio = flops_by_n[2] / flops_by_n[1]
    assert 1.7 < ratio < 2.3, ratio


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
