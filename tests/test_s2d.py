"""Space-to-depth conv lowering (EVREAL_S2D): exactness vs the direct conv.

The repack targets the one soft kernel in the b128 bf16 chunk profile — the
full-res k5 64->32 decoder conv (BASELINE.md per-kernel cost table). Each
output element of conv2d_s2d sums the identical 25*C products as conv2d, so
CPU f32 agreement is to rounding, including all borders (full-res zero pad 2
== one packed zero block).
"""

import numpy as np
import pytest

from evreal_tpu.nn.layers import conv2d, conv2d_s2d, upsample_conv_layer


def _rand_conv(rng, c_in, c_out, k=5, bias=True):
    p = {"weight": rng.standard_normal((k, k, c_in, c_out),
                                       ).astype(np.float32) * 0.1}
    if bias:
        p["bias"] = rng.standard_normal((c_out,)).astype(np.float32)
    return p


@pytest.mark.parametrize("shape,cin,cout", [
    ((1, 8, 12, 3), 3, 2),
    ((2, 46, 60, 64), 64, 32),   # the E2VID full-res decoder shape family
    ((1, 10, 10, 5), 5, 7),
])
def test_conv2d_s2d_matches_conv2d(shape, cin, cout):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float32)
    p = _rand_conv(rng, cin, cout)
    ref = np.asarray(conv2d(p, x, stride=1, padding=2))
    got = np.asarray(conv2d_s2d(p, x))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_conv2d_s2d_no_bias():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 12, 16, 4)).astype(np.float32)
    p = _rand_conv(rng, 4, 3, bias=False)
    np.testing.assert_allclose(np.asarray(conv2d_s2d(p, x)),
                               np.asarray(conv2d(p, x, padding=2)),
                               atol=2e-5, rtol=1e-5)


def test_upsample_conv_layer_s2d_gate(monkeypatch):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 23, 30, 64)).astype(np.float32)  # -> 46x60
    p = {"conv2d": _rand_conv(rng, 64, 32)}
    monkeypatch.delenv("EVREAL_S2D", raising=False)
    ref = np.asarray(upsample_conv_layer(p, x, padding=2))
    monkeypatch.setenv("EVREAL_S2D", "64")
    got = np.asarray(upsample_conv_layer(p, x, padding=2))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)
    # threshold below in-channels -> direct path (identical object math)
    monkeypatch.setenv("EVREAL_S2D", "32")
    low = np.asarray(upsample_conv_layer(p, x, padding=2))
    np.testing.assert_array_equal(low, ref)


def test_s2d_bad_env(monkeypatch):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    p = {"conv2d": _rand_conv(rng, 4, 4)}
    monkeypatch.setenv("EVREAL_S2D", "banana")
    with pytest.raises(ValueError, match="EVREAL_S2D"):
        upsample_conv_layer(p, x, padding=2)


def test_s2d_odd_resolution_falls_back(monkeypatch):
    """Odd H/W can't pack into 2x2 blocks; the gate must use the direct
    conv (full-chain models only see even padded shapes, but the layer
    is public API)."""
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 9, 12, 4)).astype(np.float32)
    p = _rand_conv(rng, 4, 3)
    monkeypatch.setenv("EVREAL_S2D", "64")
    from evreal_tpu.nn.layers import _s2d_applicable
    assert not _s2d_applicable(p, x, 1, 2)
