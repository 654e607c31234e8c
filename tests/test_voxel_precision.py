"""Binning-dot precision selection in the voxel stage.

The matmul voxelizer's one-hot contraction (ops/voxelize.voxelize_matmul)
is ~26% of the flagship pipeline's FLOPs; its dot precision is chosen by
make_voxel_stage: HIGH for f32 stages (strict parity, ~2e-5 voxel error),
DEFAULT for bf16 serving stages (1 MXU pass instead of 3 — measured
1.11-1.24x end-to-end at b128 bf16, BASELINE.md — with ~5e-3 binning
error, below the ~2e-2 bf16 materialization rounding the stage applies
anyway), EVREAL_VOXEL_PRECISION overriding both. Asserted structurally on
the traced jaxpr: CPU ignores dot precision at execution time, so the
lowering is the only observable on this host.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evreal_tpu.harness.runner import make_voxel_stage
from evreal_tpu.ops.voxelize import voxelize_matmul, voxelize_scatter

P = jax.lax.Precision


def _buffers(t=2, cap=256, h=24, w=32):
    rng = np.random.default_rng(0)
    ts = np.sort(rng.uniform(0, 0.04, (t, cap)).astype(np.float32), axis=1)
    return {
        "xs": rng.integers(0, w, (t, cap)).astype(np.int16),
        "ys": rng.integers(0, h, (t, cap)).astype(np.int16),
        "ts": ts - ts[:, :1],
        "ps": (rng.integers(0, 2, (t, cap)) * 2 - 1).astype(np.int8),
        "count": np.full((t,), 200, np.int32),
    }


def _dot_precisions(fn, bufs):
    """All dot_general precision params in fn's jaxpr, scan bodies
    included."""
    found = []

    def walk(jaxpr):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "dot_general":
                found.append(eqn.params.get("precision"))
            for v in eqn.params.values():
                vs = v if isinstance(v, (list, tuple)) else (v,)
                for item in vs:
                    inner = getattr(item, "jaxpr", item)
                    if hasattr(inner, "eqns"):
                        walk(inner)

    walk(jax.make_jaxpr(fn)(bufs).jaxpr)
    return found


def _stage_precisions(out_dtype):
    stage = make_voxel_stage(voxelize_matmul, 5, (24, 32), False,
                             out_dtype=out_dtype)
    return _dot_precisions(stage, _buffers())


def test_f32_stage_uses_high():
    assert _stage_precisions(jnp.float32) == [(P.HIGH, P.HIGH)]


def test_bf16_stage_auto_selects_default():
    assert _stage_precisions(jnp.bfloat16) == [(P.DEFAULT, P.DEFAULT)]


def test_env_overrides_both_dtypes(monkeypatch):
    monkeypatch.setenv("EVREAL_VOXEL_PRECISION", "highest")
    assert _stage_precisions(jnp.float32) == [(P.HIGHEST, P.HIGHEST)]
    assert _stage_precisions(jnp.bfloat16) == [(P.HIGHEST, P.HIGHEST)]


def test_bad_env_value_fails_fast(monkeypatch):
    monkeypatch.setenv("EVREAL_VOXEL_PRECISION", "bf16")
    with pytest.raises(ValueError, match="EVREAL_VOXEL_PRECISION"):
        make_voxel_stage(voxelize_matmul, 5, (24, 32), False)


def test_selection_only_applies_to_matmul():
    stage = make_voxel_stage(voxelize_scatter, 5, (24, 32), False,
                             out_dtype=jnp.bfloat16)
    assert _dot_precisions(stage, _buffers()) == []


def test_default_precision_binning_error_is_bounded():
    """The DEFAULT-precision binning result must stay within the bf16
    materialization budget of the serving stage (CPU executes all
    precisions identically, so this bounds only the shared math path;
    the on-chip figure is 5.1e-3, BASELINE.md)."""
    bufs = _buffers()
    ref = make_voxel_stage(voxelize_scatter, 5, (24, 32), False)(bufs)
    got = make_voxel_stage(voxelize_matmul, 5, (24, 32), False,
                           out_dtype=jnp.bfloat16)(bufs)
    err = np.abs(np.asarray(got, np.float32)
                 - np.asarray(ref, np.float32)).max()
    assert err < 2e-2, err


def test_env_rejects_precision_the_impl_cannot_honor(monkeypatch):
    """A pinned precision the selected voxelizer cannot lower is an
    operator error, not a silent no-op (ADVICE r03)."""
    from evreal_tpu.kernels.voxelize_pallas import voxelize_pallas_windows

    monkeypatch.setenv("EVREAL_VOXEL_PRECISION", "high")
    with pytest.raises(ValueError, match="cannot honor"):
        make_voxel_stage(voxelize_scatter, 5, (24, 32), False)
    with pytest.raises(ValueError, match="cannot honor"):
        make_voxel_stage(voxelize_pallas_windows, 5, (24, 32), False)
    monkeypatch.setenv("EVREAL_VOXEL_PRECISION", "default")
    make_voxel_stage(voxelize_pallas_windows, 5, (24, 32), False)  # ok


def test_bf16_stage_auto_selects_default_for_pallas():
    """The bf16 serving stage passes Precision.DEFAULT to a voxelizer that
    declares it supported (the Pallas windows kernel's bf16-factor
    path)."""
    seen = {}

    def fake(xs, ys, ts, ps, count, num_bins, hw, precision=None):
        seen["precision"] = precision
        return jnp.zeros((xs.shape[0], num_bins) + hw, jnp.float32)

    fake.windows_batched = True
    fake.supported_precisions = ("highest", "default")
    stage = make_voxel_stage(fake, 5, (24, 32), False,
                             out_dtype=jnp.bfloat16)
    stage(_buffers())
    assert seen["precision"] == P.DEFAULT
