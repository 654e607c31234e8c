"""Fused 2x-bilinear-upsample + k5 conv (EVREAL_UPFUSE): exactness vs the
sequential resize_bilinear -> conv2d path.

The fusion folds the reference UpsampleConvLayer's bilinear blend
(submodules.py:69-97, F.interpolate align_corners=False semantics) into the
5x5 kernel and runs one conv on the pre-upsample grid — identical math up to
fp reassociation, including the conv's zero-pad-over-clamped-resize borders
(recomputed exactly by the band convs, covering corners).
"""

import numpy as np
import pytest

from evreal_tpu.nn.layers import (
    conv2d,
    resize_bilinear,
    upsample_conv2x_fused,
    upsample_conv_layer,
)


def _rand_conv(rng, c_in, c_out, bias=True):
    p = {"weight": rng.standard_normal((5, 5, c_in, c_out),
                                       ).astype(np.float32) * 0.1}
    if bias:
        p["bias"] = rng.standard_normal((c_out,)).astype(np.float32)
    return p


def _ref(p, x):
    n, h, w, _ = x.shape
    return np.asarray(conv2d(p, np.asarray(resize_bilinear(x, 2 * h, 2 * w)),
                             stride=1, padding=2))


@pytest.mark.parametrize("shape,cin,cout", [
    ((1, 8, 12, 3), 3, 2),
    ((2, 23, 30, 16), 16, 8),    # E2VID full-res decoder shape family (h/2)
    ((1, 9, 13, 5), 5, 7),       # odd input dims — no evenness requirement
    ((1, 3, 3, 2), 2, 3),        # minimum size: bands cover the whole image
    ((1, 3, 17, 4), 4, 2),
])
def test_upfuse_matches_sequential(shape, cin, cout):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float32)
    p = _rand_conv(rng, cin, cout)
    ref = _ref(p, x)
    got = np.asarray(upsample_conv2x_fused(p, x))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_upfuse_no_bias():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 12, 10, 4)).astype(np.float32)
    p = _rand_conv(rng, 4, 3, bias=False)
    np.testing.assert_allclose(np.asarray(upsample_conv2x_fused(p, x)),
                               _ref(p, x), atol=2e-5, rtol=1e-5)


def test_upsample_conv_layer_upfuse_gate(monkeypatch):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 23, 30, 16)).astype(np.float32)
    p = {"conv2d": _rand_conv(rng, 16, 8)}
    monkeypatch.delenv("EVREAL_UPFUSE", raising=False)
    ref = np.asarray(upsample_conv_layer(p, x, padding=2))
    monkeypatch.setenv("EVREAL_UPFUSE", "1")
    got = np.asarray(upsample_conv_layer(p, x, padding=2))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_upfuse_bad_env(monkeypatch):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    p = {"conv2d": _rand_conv(rng, 4, 4)}
    monkeypatch.setenv("EVREAL_UPFUSE", "yes")
    with pytest.raises(ValueError, match="EVREAL_UPFUSE"):
        upsample_conv_layer(p, x, padding=2)


def test_upfuse_k3_falls_back(monkeypatch):
    """Only k5 pad-2 composes (all reference UpsampleConvLayers are k5);
    other shapes must take the sequential path unchanged."""
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    p = {"conv2d": {"weight": rng.standard_normal((3, 3, 4, 4),
                                                  ).astype(np.float32)}}
    monkeypatch.delenv("EVREAL_UPFUSE", raising=False)
    ref = np.asarray(upsample_conv_layer(p, x, padding=1))
    monkeypatch.setenv("EVREAL_UPFUSE", "1")
    np.testing.assert_array_equal(
        np.asarray(upsample_conv_layer(p, x, padding=1)), ref)
