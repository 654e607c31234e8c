"""EVREAL_FUSED: the fused voxelize-inside-scan chunk program must be a
scheduling/materialization change only — outputs and carried state equal to
the two-stage program (voxel stage vmapped over all windows, then a model
scan) that it replaced. The on-chip A/B (BASELINE.md "Fused
voxelize-into-scan") measured agreement to 4.9e-6 in f32; here the two
lowerings are locked together on CPU so a semantic drift in either path
fails loudly rather than as a perf-only diff. At n=1 the two forms are
bit-identical; at n>1 the two-stage form vmaps the voxel contraction over
sequences while the fused step feeds it (N, E) windows, and the batched
matmul's different contraction grouping reassociates sums — measured
8.3e-7 max on CPU f32 (the on-chip f32 A/B read 4.9e-6), so that case
asserts a 1e-5 ceiling instead of bit-equality.

Reference semantics being preserved: event_utils.py:27-59 voxelization per
window, then model/model.py forward per window — the reference has no chunk
dimension at all, so BOTH forms must reduce to its per-window math.
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


def _leaves(tree):
    import jax
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def test_batched_fused_matches_two_stage(monkeypatch):
    model, params = build_flagship_e2vid(seed=0)
    h, w, t = 32, 48, 5
    bufs = _buffers(np.random.default_rng(0), 2, t, h, w)
    outs = {}
    for fused in (True, False):
        monkeypatch.setattr(runner_mod, "FUSED", fused)
        r = BatchedRunner(model, params, event_norm=True,
                          post_norm="robust", height=h, width=w,
                          num_bins=5, n=2, chunk_t=t)
        assert r.fused is fused
        state = r.init_state()
        state, imgs, clipped = r.run(state, bufs)
        outs[fused] = (np.asarray(imgs), np.asarray(clipped),
                       _leaves(state))
    # n>1: fp reassociation only (module docstring) — tight ceiling
    np.testing.assert_allclose(outs[True][0], outs[False][0], atol=1e-5,
                               rtol=0)
    np.testing.assert_allclose(outs[True][1], outs[False][1], atol=1e-5,
                               rtol=0)
    for a, b in zip(outs[True][2], outs[False][2]):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=0)


def test_single_seq_fused_matches_two_stage(monkeypatch):
    model, params = build_flagship_e2vid(seed=1)
    h, w, t = 32, 48, 4
    bufs3 = _buffers(np.random.default_rng(1), 1, t, h, w)
    bufs = {k: v[0] for k, v in bufs3.items()}
    outs = {}
    for fused in (True, False):
        monkeypatch.setattr(runner_mod, "FUSED", fused)
        r = MethodRunner(model, params, event_norm=True, post_norm="robust",
                         height=h, width=w, num_bins=5, chunk_t=t)
        assert r.fused is fused
        state = r.init_state()
        state, imgs, clipped = r.run(state, bufs)
        outs[fused] = (np.asarray(imgs), np.asarray(clipped))
    assert np.array_equal(outs[True][0], outs[False][0])
    assert np.array_equal(outs[True][1], outs[False][1])


def test_fused_zero_event_windows(monkeypatch):
    """A window with count=0 must voxelize to zeros in both forms (the
    reference returns a zero grid for an empty window — event_utils.py:27)."""
    model, params = build_flagship_e2vid(seed=2)
    h, w, t = 32, 48, 3
    bufs = _buffers(np.random.default_rng(2), 1, t, h, w)
    bufs["count"][:, 1] = 0
    outs = {}
    for fused in (True, False):
        monkeypatch.setattr(runner_mod, "FUSED", fused)
        r = BatchedRunner(model, params, event_norm=True, post_norm="none",
                          height=h, width=w, num_bins=5, n=1, chunk_t=t)
        state = r.init_state()
        _, imgs, _ = r.run(state, bufs)
        outs[fused] = np.asarray(imgs)
    assert np.array_equal(outs[True], outs[False])
    assert np.all(np.isfinite(outs[True]))
