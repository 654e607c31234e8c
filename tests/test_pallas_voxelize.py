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
