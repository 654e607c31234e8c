"""EVREAL_SCAN_UNROLL: the model-scan unroll factor must be a pure
scheduling knob — outputs and carried state bit-identical to unroll=1,
including a chunk length the factor does not divide (lax.scan remainder).
"""

import numpy as np

import evreal_tpu.harness.runner as runner_mod
from evreal_tpu.harness.batched import BatchedRunner
from evreal_tpu.harness.runner import MethodRunner
from evreal_tpu.models import build_flagship_e2vid


def _buffers(rng, n, t, h, w, cap=512):
    bufs = {
        "xs": rng.integers(0, w, (n, t, cap)).astype(np.int16),
        "ys": rng.integers(0, h, (n, t, cap)).astype(np.int16),
        "ts": np.sort(rng.uniform(0, 0.04, (n, t, cap))
                      .astype(np.float32), axis=2),
        "ps": (rng.integers(0, 2, (n, t, cap)) * 2 - 1).astype(np.int8),
        "count": np.full((n, t), 400, np.int32),
    }
    bufs["ts"] -= bufs["ts"][:, :, :1]
    return bufs


def test_batched_unroll_bit_identical(monkeypatch):
    model, params = build_flagship_e2vid(seed=0)
    h, w, t = 32, 48, 7  # 7 % 4 != 0 — exercises the scan remainder
    bufs = _buffers(np.random.default_rng(0), 2, t, h, w)
    outs = {}
    for unroll in (1, 4):
        monkeypatch.setattr(runner_mod, "SCAN_UNROLL", unroll)
        r = BatchedRunner(model, params, event_norm=True,
                          post_norm="robust", height=h, width=w,
                          num_bins=5, n=2, chunk_t=t)
        state = r.init_state()
        state, imgs, clipped = r.run(state, bufs)
        outs[unroll] = (np.asarray(imgs), np.asarray(clipped),
                        [np.asarray(leaf) for leaf in
                         __import__("jax").tree_util.tree_leaves(state)])
    assert np.array_equal(outs[1][0], outs[4][0])
    assert np.array_equal(outs[1][1], outs[4][1])
    for a, b in zip(outs[1][2], outs[4][2]):
        assert np.array_equal(a, b)


def test_single_seq_unroll_bit_identical(monkeypatch):
    model, params = build_flagship_e2vid(seed=1)
    h, w, t = 32, 48, 6
    bufs3 = _buffers(np.random.default_rng(1), 1, t, h, w)
    bufs = {k: v[0] for k, v in bufs3.items()}
    outs = {}
    for unroll in (1, 3):
        monkeypatch.setattr(runner_mod, "SCAN_UNROLL", unroll)
        r = MethodRunner(model, params, event_norm=True, post_norm="robust",
                         height=h, width=w, num_bins=5, chunk_t=t)
        state = r.init_state()
        state, imgs, clipped = r.run(state, bufs)
        outs[unroll] = (np.asarray(imgs), np.asarray(clipped))
    assert np.array_equal(outs[1][0], outs[3][0])
    assert np.array_equal(outs[1][1], outs[3][1])


def test_voxel_stage_out_dtype_same_rounding():
    """make_voxel_stage(out_dtype=bf16) must equal compute-in-f32 then
    cast — the serving-dtype output is a materialization change, not a
    numerics change (binning/normalization stay f32 inside the stage)."""
    import jax.numpy as jnp

    from evreal_tpu.harness.runner import make_voxel_stage
    from evreal_tpu.ops.voxelize import voxelize_scatter

    h, w, t = 24, 32, 4
    bufs = _buffers(np.random.default_rng(3), 1, t, h, w, cap=256)
    args = {k: bufs[k][0] for k in ("xs", "ys", "ts", "ps", "count")}
    for event_norm in (False, True):
        f32 = make_voxel_stage(voxelize_scatter, 5, (h, w), event_norm)
        bf16 = make_voxel_stage(voxelize_scatter, 5, (h, w), event_norm,
                                out_dtype=jnp.bfloat16)
        out = bf16(args)
        assert out.dtype == jnp.bfloat16
        a = np.asarray(out)
        b = np.asarray(f32(args).astype(jnp.bfloat16))
        assert np.array_equal(a, b)
