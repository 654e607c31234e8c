"""EVREAL_DTYPE=bfloat16 compute mode: outputs must track f32 closely."""

import numpy as np

from evreal_tpu.convert import load_method_checkpoint, nest
from evreal_tpu.harness.runner import MethodRunner
from evreal_tpu.models import build_from_meta

from .test_end_to_end import CKPT


def _run(monkeypatch, dtype_env):
    monkeypatch.setenv("EVREAL_DTYPE", dtype_env)
    flat, meta = load_method_checkpoint("FireNet+", CKPT)
    model = build_from_meta(meta)
    runner = MethodRunner(model, nest(flat), event_norm=False,
                          post_norm="none", height=32, width=48, num_bins=5,
                          chunk_t=4)
    rng = np.random.default_rng(0)
    cap = 2048
    buffers = {
        "xs": rng.integers(0, 48, (4, cap)).astype(np.float32),
        "ys": rng.integers(0, 32, (4, cap)).astype(np.float32),
        "ts": np.sort(rng.uniform(0, 0.04, (4, cap)).astype(np.float32), 1),
        "ps": (rng.integers(0, 2, (4, cap)) * 2 - 1).astype(np.float32),
        "count": np.full((4,), 1500, np.int32),
    }
    buffers["ts"] -= buffers["ts"][:, :1]
    state = runner.init_state()
    _, imgs, clipped = runner.run(state, buffers)
    return np.asarray(clipped)


def test_bf16_tracks_f32(monkeypatch):
    f32 = _run(monkeypatch, "float32")
    bf16 = _run(monkeypatch, "bfloat16")
    assert f32.dtype == bf16.dtype == np.float32
    # bf16 recurrent rollout drifts, but stays visually equivalent
    assert np.abs(f32 - bf16).mean() < 0.02
    assert np.abs(f32 - bf16).max() < 0.2


def test_cast_params_stays_on_host():
    """The serving-dtype cast must not dispatch device programs during
    runner construction (it runs before the staging loop, which rides the
    pre-compute H2D window), and must round like XLA (to-nearest-even)."""
    import jax.numpy as jnp

    from evreal_tpu.harness.runner import cast_params

    tree = {"w": np.float32([1.0, 1.0039062, 3.1415927]),
            "b": np.zeros((3,), np.float32)}
    out = cast_params(tree, jnp.bfloat16)
    assert all(isinstance(leaf, np.ndarray) for leaf in out.values())
    assert out["w"].dtype == np.dtype(jnp.bfloat16)
    expected = np.asarray(jnp.asarray(tree["w"], jnp.bfloat16))
    assert np.array_equal(out["w"].view(np.uint16),
                          expected.view(np.uint16))
    # f32 is the identity — same objects, no copies
    ident = cast_params(tree, jnp.float32)
    assert ident["w"] is tree["w"]
