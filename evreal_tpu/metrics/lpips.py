"""LPIPS (AlexNet backbone) — device-side port of the metric the reference
pulls in through pyiqa (utils/eval_metrics.py:100-159).

Architecture: scaling layer -> AlexNet conv stack (taps after each of the 5
ReLUs) -> per-channel unit-normalization -> squared difference -> learned 1x1
"lin" weights -> spatial mean -> sum over taps. Inputs are HxW grayscale in
[0,1]; they are replicated to 3 channels and mapped to [-1,1] (pyiqa calls
LPIPS with normalize=True).

Pretrained weights are required and cannot be derived in-repo; load them from
an ``.npz`` produced by ``tools/convert_lpips.py`` (run it anywhere torch +
torchvision + lpips weights are available). If the file is absent the metric
reports itself unavailable and the harness skips it, like the reference does
for unknown metric names (eval_metrics.py:203).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from evreal_tpu.nn.layers import conv2d

DEFAULT_WEIGHTS = os.path.join(os.path.dirname(__file__), os.pardir, os.pardir,
                               "weights", "lpips_alex.npz")

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# (kernel, stride, pad, maxpool_before)
_ALEX_CFG = [
    ("features.0", 4, 2, False),   # conv1 11x11/4
    ("features.3", 1, 2, True),    # conv2 5x5
    ("features.6", 1, 1, True),    # conv3 3x3
    ("features.8", 1, 1, False),   # conv4 3x3
    ("features.10", 1, 1, False),  # conv5 3x3
]


def weights_available(path=None):
    return os.path.exists(path or os.environ.get("EVREAL_LPIPS_WEIGHTS",
                                                  DEFAULT_WEIGHTS))


def load_weights(path=None):
    path = path or os.environ.get("EVREAL_LPIPS_WEIGHTS", DEFAULT_WEIGHTS)
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


def _maxpool(x):
    """torch MaxPool2d(kernel_size=3, stride=2) on NHWC — VALID
    reduce_window already matches torch's floor mode exactly
    (floor((dim - 3)/2) + 1 outputs; trailing rows/cols never read)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _alex_features(w, x):
    taps = []
    for name, stride, pad, pool_before in _ALEX_CFG:
        if pool_before:
            x = _maxpool(x)
        p = {"weight": w[f"{name}.weight"], "bias": w[f"{name}.bias"]}
        x = jax.nn.relu(conv2d(p, x, stride=stride, padding=pad))
        taps.append(x)
    return taps


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


def lpips(w, img, ref):
    """LPIPS distance between two HxW (or NHW) grayscale images in [0,1]."""
    if img.ndim == 2:
        img = img[None]
        ref = ref[None]
    x = jnp.repeat(img[..., None], 3, axis=-1) * 2.0 - 1.0
    y = jnp.repeat(ref[..., None], 3, axis=-1) * 2.0 - 1.0
    x = (x - _SHIFT) / _SCALE
    y = (y - _SHIFT) / _SCALE
    fx = _alex_features(w, x)
    fy = _alex_features(w, y)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = _unit_normalize(a) - _unit_normalize(b)
        d = d * d
        lin = {"weight": w[f"lin.{i}.weight"]}
        total = total + jnp.mean(conv2d(lin, d), axis=(1, 2, 3))
    return total
