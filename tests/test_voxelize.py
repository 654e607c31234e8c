import numpy as np
import pytest

from evreal_tpu.ops.voxelize import voxelize, events_to_image

from .oracle import ref_module


def torch_voxel(xs, ys, ts, ps, num_bins, sensor):
    import torch

    ev = ref_module("utils.event_utils")
    out = ev.events_to_voxel_torch(
        torch.tensor(xs), torch.tensor(ys), torch.tensor(ts - ts[0]),
        torch.tensor(ps), num_bins, sensor_size=sensor)
    return out.numpy()


def random_events(n, h, w, seed=0, dt=0.05):
    rng = np.random.default_rng(seed)
    xs = rng.integers(0, w, n).astype(np.float32)
    ys = rng.integers(0, h, n).astype(np.float32)
    ts = np.sort(rng.uniform(0, dt, n)).astype(np.float32)
    ts[0] = 0.0
    ps = (rng.integers(0, 2, n) * 2 - 1).astype(np.float32)
    return xs, ys, ts, ps


def pack(xs, ys, ts, ps, cap):
    n = len(xs)
    pad = cap - n
    f = lambda a: np.pad(a, (0, pad)).astype(np.float32)
    return f(xs), f(ys), f(ts), f(ps), np.int32(n)


@pytest.mark.parametrize("impl", ["scatter", "matmul"])
def test_voxelize_matches_reference(impl):
    h, w, b = 32, 48, 5
    xs, ys, ts, ps = random_events(1000, h, w, seed=1)
    want = torch_voxel(xs, ys, ts, ps, b, (h, w))
    got = np.asarray(voxelize(*pack(xs, ys, ts, ps, 1024), num_bins=b,
                              sensor_size=(h, w), impl=impl))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("impl", ["scatter", "matmul"])
def test_voxelize_degenerate_dt(impl):
    """dt < 1e-9 triggers the linspace spread path."""
    h, w, b = 16, 16, 5
    n = 37
    xs, ys, _, ps = random_events(n, h, w, seed=2)
    ts = np.zeros(n, np.float32)
    want = torch_voxel(xs, ys, ts, ps, b, (h, w))
    got = np.asarray(voxelize(*pack(xs, ys, ts, ps, 64), num_bins=b,
                              sensor_size=(h, w), impl=impl))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("impl", ["scatter", "matmul"])
def test_voxelize_single_event(impl):
    h, w, b = 8, 8, 5
    xs = np.array([3.0], np.float32)
    ys = np.array([4.0], np.float32)
    ts = np.array([0.0], np.float32)
    ps = np.array([1.0], np.float32)
    want = torch_voxel(xs, ys, ts, ps, b, (h, w))
    got = np.asarray(voxelize(*pack(xs, ys, ts, ps, 16), num_bins=b,
                              sensor_size=(h, w), impl=impl))
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("impl", ["scatter", "matmul"])
def test_voxelize_zero_count(impl):
    h, w, b = 8, 8, 5
    z = np.zeros(16, np.float32)
    got = np.asarray(voxelize(z, z, z, z, np.int32(0), num_bins=b,
                              sensor_size=(h, w), impl=impl))
    assert got.shape == (b, h, w)
    np.testing.assert_array_equal(got, 0)


@pytest.mark.parametrize("impl", ["scatter", "matmul"])
def test_voxelize_mass_conservation(impl):
    """sum(voxel) == sum(ps) when no events fall outside [0, B-1] bins."""
    h, w, b = 16, 24, 5
    xs, ys, ts, ps = random_events(500, h, w, seed=3)
    got = np.asarray(voxelize(*pack(xs, ys, ts, ps, 512), num_bins=b,
                              sensor_size=(h, w), impl=impl))
    np.testing.assert_allclose(got.sum(), ps.sum(), atol=1e-2)


def test_voxelize_padding_ignored():
    """Garbage beyond count must not leak into the voxel."""
    h, w, b = 16, 16, 5
    xs, ys, ts, ps = random_events(100, h, w, seed=4)
    packed = list(pack(xs, ys, ts, ps, 128))
    base = np.asarray(voxelize(*packed, num_bins=b, sensor_size=(h, w)))
    # poison the tail
    for i in range(4):
        packed[i] = packed[i].copy()
        packed[i][100:] = 7.0
    poisoned = np.asarray(voxelize(*packed, num_bins=b, sensor_size=(h, w)))
    np.testing.assert_array_equal(base, poisoned)


def test_events_to_image():
    import torch

    ev = ref_module("utils.event_utils")
    h, w = 16, 24
    xs, ys, _, ps = random_events(300, h, w, seed=5)
    want = ev.events_to_image_torch(
        torch.tensor(xs), torch.tensor(ys), torch.tensor(ps),
        sensor_size=(h, w)).numpy()
    xs_p, ys_p, _, ps_p, n = pack(xs, ys, np.zeros_like(xs), ps, 512)
    got = np.asarray(events_to_image(xs_p, ys_p, ps_p, n, (h, w)))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("impl", ["scatter", "matmul"])
def test_voxelize_unsorted_outlier_deposits_nothing(impl):
    """An unsorted timestamp with t_norm <= -1 gets zero weight in the
    reference (max(0, 1-|t_norm-b|) = 0 for every bin); the one-hot paths
    must not charge bin 0 through their clipped row index (guard
    lo + 1 >= 0 in _event_rows_cols)."""
    h, w, b = 8, 16, 5
    xs = np.array([3.0, 5.0, 7.0], np.float32)
    ys = np.array([2.0, 4.0, 6.0], np.float32)
    # window spans [10, 11]; middle event at 9.0 -> t_norm = -4
    ts = np.array([10.0, 9.0, 11.0], np.float32)
    ps = np.array([1.0, 1.0, 1.0], np.float32)
    got = np.asarray(voxelize(*pack(xs, ys, ts, ps, 8), num_bins=b,
                              sensor_size=(h, w), impl=impl))
    want = torch_voxel(xs, ys, ts, ps, b, (h, w))
    np.testing.assert_allclose(got, want, atol=2e-5)
    assert got[:, 4, 5].sum() == 0  # the outlier's pixel stays empty


@pytest.mark.parametrize("impl", ["scatter", "matmul"])
def test_voxelize_zero_capacity(impl):
    """Zero-length event buffers (capacity 0) must voxelize to zeros, not
    divide by zero while chunking."""
    z = np.zeros((0,), np.float32)
    got = np.asarray(voxelize(z, z, z, z, np.int32(0), num_bins=5,
                              sensor_size=(8, 16), impl=impl))
    assert got.shape == (5, 8, 16) and not got.any()


def test_voxelize_impl_agreement_fuzz():
    """Property fuzz: scatter / matmul / pallas(interpret) agree bit-exactly
    on CPU across random shapes, OOB coords, unsorted and degenerate
    timestamps, and partial counts."""
    from evreal_tpu.kernels.voxelize_pallas import voxelize_pallas
    from evreal_tpu.ops.voxelize import voxelize_matmul, voxelize_scatter

    rng = np.random.default_rng(42)
    for _ in range(15):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 48))
        b = int(rng.integers(1, 7))
        cap = int(rng.integers(1, 300))
        n = int(rng.integers(0, cap + 1))
        xs = rng.uniform(-3, w + 3, cap).astype(np.float32)
        ys = rng.uniform(-3, h + 3, cap).astype(np.float32)
        ts = rng.uniform(0, 0.01, cap).astype(np.float32)
        if rng.random() < 0.3 and n > 1:
            ts[:n] = np.sort(ts[:n])
        if rng.random() < 0.2:
            ts[:] = 0.5  # degenerate dt
        ps = (rng.integers(0, 2, cap) * 2 - 1).astype(np.float32)
        args = (xs, ys, ts, ps, np.int32(n))
        vs = np.asarray(voxelize_scatter(*args, b, (h, w)))
        vm = np.asarray(voxelize_matmul(*args, b, (h, w)))
        vp = np.asarray(voxelize_pallas(*args, b, (h, w), interpret=True))
        np.testing.assert_array_equal(vs, vm)
        np.testing.assert_array_equal(vs, vp)
