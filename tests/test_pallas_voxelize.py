"""Pallas voxelizer kernel parity (interpret mode on CPU; the same kernel is
validated compiled on the real chip — see BASELINE.md)."""

import numpy as np
import pytest

from evreal_tpu.kernels.voxelize_pallas import voxelize as vox_pallas
from evreal_tpu.ops.voxelize import voxelize as vox_ref

from .test_voxelize import pack, random_events


@pytest.mark.parametrize("n,cap", [(3000, 4096), (100, 2048), (0, 1024)])
def test_pallas_matches_scatter(n, cap):
    h, w, b = 32, 48, 5
    if n:
        xs, ys, ts, ps = random_events(n, h, w, seed=4)
    else:
        xs = ys = ts = ps = np.zeros(0, np.float32)
    args = pack(xs, ys, ts, ps, cap)
    ref = np.asarray(vox_ref(*args, num_bins=b, sensor_size=(h, w),
                             impl="scatter"))
    got = np.asarray(vox_pallas(*args, num_bins=b, sensor_size=(h, w),
                                interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_pallas_windows_batch_matches_matmul():
    """Whole-chunk batched kernel (grid over window blocks) vs the vmapped
    XLA matmul, incl. T not divisible by the window tile and zero/full
    counts."""
    import jax
    import jax.numpy as jnp

    from evreal_tpu.kernels.voxelize_pallas import voxelize_pallas_windows
    from evreal_tpu.ops.voxelize import voxelize_matmul

    h, w, b, cap, t = 24, 32, 5, 1024, 11
    rng = np.random.default_rng(8)
    xs = rng.integers(0, w, (t, cap)).astype(np.int16)
    ys = rng.integers(0, h, (t, cap)).astype(np.int16)
    ts = np.sort(rng.uniform(0, 0.03, (t, cap)).astype(np.float32), axis=1)
    ts -= ts[:, :1]
    ps = (rng.integers(0, 2, (t, cap)) * 2 - 1).astype(np.int8)
    count = rng.integers(0, cap + 1, t).astype(np.int32)
    count[0], count[1] = 0, cap

    got = np.asarray(voxelize_pallas_windows(
        xs, ys, ts, ps, count, b, (h, w), interpret=True))

    def one(x, y, tt, p, c):
        return voxelize_matmul(x, y, tt, p.astype(jnp.float32), c, b, (h, w))

    want = np.asarray(jax.vmap(one)(xs, ys, ts, ps, count))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pallas_windows_through_voxel_stage():
    """EVREAL_VOXELIZE=pallas routes the whole-chunk kernel through
    make_voxel_stage (no vmap)."""
    import jax.numpy as jnp

    from evreal_tpu.harness.runner import make_voxel_stage
    from evreal_tpu.kernels.voxelize_pallas import voxelize_pallas_windows
    from evreal_tpu.ops.voxelize import voxelize_scatter

    def interp(xs, ys, ts, ps, count, num_bins, hw):
        return voxelize_pallas_windows(xs, ys, ts, ps, count, num_bins, hw,
                                       interpret=True)

    interp.windows_batched = True

    h, w, b, cap, t = 16, 32, 5, 1024, 4
    rng = np.random.default_rng(1)
    xs = rng.integers(0, w, (t, cap)).astype(np.int16)
    ys = rng.integers(0, h, (t, cap)).astype(np.int16)
    ts = np.sort(rng.uniform(0, 0.03, (t, cap)).astype(np.float32), axis=1)
    ts -= ts[:, :1]
    ps = (rng.integers(0, 2, (t, cap)) * 2 - 1).astype(np.int8)
    count = np.full((t,), 700, np.int32)

    bufs = {"xs": xs, "ys": ys, "ts": ts, "ps": ps, "count": count}
    stage_p = make_voxel_stage(interp, b, (h, w), True)
    stage_s = make_voxel_stage(voxelize_scatter, b, (h, w), True)
    np.testing.assert_allclose(
        np.asarray(stage_p(bufs)), np.asarray(stage_s(bufs)), atol=2e-5)


def test_pallas_windows_large_sensor_tile_shrink():
    """The B*H axis is blocked so the (8, bh_blk, W) output block fits
    VMEM for any sensor; interpret mode checks the blocked math (incl.
    the padded-rows slice) stays right."""
    import jax.numpy as jnp

    from evreal_tpu.kernels.voxelize_pallas import (
        _bh_block,
        voxelize_pallas_windows,
    )
    from evreal_tpu.ops.voxelize import voxelize_matmul

    h, w, b, t_n, cap = 260, 346, 5, 3, 256  # MVSEC resolution
    # MVSEC: 8 blocks of 168 rows (1300 padded to 1344); block 8x168x346
    # f32 = 1.9 MB
    assert _bh_block(b * h, w) == 168
    # ECD: 4 blocks of 232 (900 -> 928); block 8x232x240 f32 = 1.7 MB
    assert _bh_block(5 * 180, 240) == 232
    # small test sensors: one block, rounded up to the 8-row tile
    assert _bh_block(5 * 24, 32) == 120
    rng = np.random.default_rng(0)
    xs = rng.integers(0, w, (t_n, cap)).astype(np.float32)
    ys = rng.integers(0, h, (t_n, cap)).astype(np.float32)
    ts = np.sort(rng.uniform(0, 0.05, (t_n, cap)), axis=1).astype(np.float32)
    ps = (rng.integers(0, 2, (t_n, cap)) * 2 - 1).astype(np.float32)
    count = np.full((t_n,), 200, np.int32)

    got = np.asarray(voxelize_pallas_windows(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ts), jnp.asarray(ps),
        jnp.asarray(count), b, (h, w), interpret=True))
    want = np.stack([np.asarray(voxelize_matmul(
        xs[i], ys[i], ts[i], ps[i], count[i], b, (h, w)))
        for i in range(t_n)])
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pallas_windows_default_precision_bounded():
    """precision=DEFAULT (bf16 one-hot factors, the bf16 serving mode's
    auto-choice) stays within the bf16 materialization budget vs the
    HIGHEST kernel, and HIGH is rejected (Mosaic cannot lower it)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from evreal_tpu.kernels.voxelize_pallas import voxelize_pallas_windows

    h, w, b, cap, t = 24, 32, 5, 1024, 4
    rng = np.random.default_rng(3)
    xs = rng.integers(0, w, (t, cap)).astype(np.int16)
    ys = rng.integers(0, h, (t, cap)).astype(np.int16)
    ts = np.sort(rng.uniform(0, 0.03, (t, cap)).astype(np.float32), axis=1)
    ts -= ts[:, :1]
    ps = (rng.integers(0, 2, (t, cap)) * 2 - 1).astype(np.int8)
    count = np.full((t,), 900, np.int32)
    args = (jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ts),
            jnp.asarray(ps), jnp.asarray(count), b, (h, w))

    ref = np.asarray(voxelize_pallas_windows(*args, interpret=True))
    got = np.asarray(voxelize_pallas_windows(
        *args, interpret=True, precision=jax.lax.Precision.DEFAULT))
    # per-event weights round to bf16 (rel ~4e-3); cells accumulate O(10)
    # events here
    assert np.abs(got - ref).max() < 2e-2
    assert np.abs(got - ref).max() > 0  # the cast actually happened

    with pytest.raises(ValueError, match="not lowerable"):
        voxelize_pallas_windows(*args, interpret=True,
                                precision=jax.lax.Precision.HIGH)
