"""LPIPS math parity vs a torch oracle with random weights.

The pretrained AlexNet/LPIPS weights are not available offline (see
tools/convert_lpips.py), but the *math* of the port — conv geometry
(11x11/4 pad2, 5x5 pad2, 3x3 pad1), MaxPool2d(3,2) floor mode, the
scaling layer, per-channel unit-normalization, 1x1 lin heads, spatial
averaging and tap summation — is fully determined by the architecture
(reference pulls it in via pyiqa, utils/eval_metrics.py:100-159; the
underlying net is the lpips package's LPIPS(net='alex')). We rebuild that
forward in torch with random weights and require agreement.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from evreal_tpu.metrics import lpips as lpips_mod

_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

# torchvision AlexNet features indices: conv at 0,3,6,8,10; pools at 2,5,12.
_CONVS = [
    (0, 3, 64, 11, 4, 2),
    (3, 64, 192, 5, 1, 2),
    (6, 192, 384, 3, 1, 1),
    (8, 384, 256, 3, 1, 1),
    (10, 256, 256, 3, 1, 1),
]
_POOL_BEFORE = {3, 6}


def _random_weights(rng):
    w = {}
    for idx, cin, cout, k, _, _ in _CONVS:
        w[f"features.{idx}.weight"] = rng.normal(
            0, 0.1, (cout, cin, k, k)).astype(np.float32)
        w[f"features.{idx}.bias"] = rng.normal(0, 0.1, (cout,)).astype(
            np.float32)
    for i, (_, _, cout, _, _, _) in enumerate(_CONVS):
        # LPIPS lin heads are non-negative 1x1 convs without bias.
        w[f"lin.{i}.weight"] = np.abs(
            rng.normal(0, 0.1, (1, cout, 1, 1))).astype(np.float32)
    return w


def _torch_lpips(w, img, ref):
    """Oracle: the lpips-package LPIPS(net='alex', normalize=True) forward."""

    def features(x):
        taps = []
        for idx, _, _, k, stride, pad in _CONVS:
            if idx in _POOL_BEFORE:
                x = F.max_pool2d(x, 3, 2)
            weight = torch.from_numpy(w[f"features.{idx}.weight"])
            bias = torch.from_numpy(w[f"features.{idx}.bias"])
            x = F.relu(F.conv2d(x, weight, bias, stride=stride, padding=pad))
            taps.append(x)
        return taps

    def unit_norm(x):
        return x / (torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True))
                    + 1e-10)

    def prep(a):
        a = torch.from_numpy(a)[None, None].repeat(1, 3, 1, 1)
        a = a * 2.0 - 1.0
        return (a - _SHIFT) / _SCALE

    fx, fy = features(prep(img)), features(prep(ref))
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = (unit_norm(a) - unit_norm(b)) ** 2
        lin = torch.from_numpy(w[f"lin.{i}.weight"])
        total = total + F.conv2d(d, lin).mean(dim=(2, 3))
    return float(total.squeeze())


@pytest.mark.parametrize("hw", [(96, 96), (95, 101)])
def test_lpips_matches_torch_oracle(hw):
    rng = np.random.default_rng(0)
    w = _random_weights(rng)
    h, wd = hw
    img = rng.random((h, wd)).astype(np.float32)
    ref = np.clip(img + rng.normal(0, 0.1, (h, wd)), 0, 1).astype(np.float32)

    expected = _torch_lpips(w, img, ref)
    jw = {k: lpips_mod.jnp.asarray(
        v.transpose(2, 3, 1, 0) if v.ndim == 4 else v)
        for k, v in w.items()}
    got = float(np.asarray(lpips_mod.lpips(jw, img, ref))[0])
    assert got == pytest.approx(expected, abs=2e-5), (got, expected)


def test_lpips_zero_for_identical_images():
    rng = np.random.default_rng(1)
    w = _random_weights(rng)
    jw = {k: lpips_mod.jnp.asarray(
        v.transpose(2, 3, 1, 0) if v.ndim == 4 else v)
        for k, v in w.items()}
    img = rng.random((96, 96)).astype(np.float32)
    got = float(np.asarray(lpips_mod.lpips(jw, img, img))[0])
    assert abs(got) < 1e-6


def test_registry_picks_up_lpips_weights(tmp_path, monkeypatch):
    rng = np.random.default_rng(2)
    w = _random_weights(rng)
    npz = {k: (v.transpose(2, 3, 1, 0) if v.ndim == 4 else v)
           for k, v in w.items()}
    path = tmp_path / "lpips_alex.npz"
    np.savez(path, **npz)
    monkeypatch.setenv("EVREAL_LPIPS_WEIGHTS", str(path))
    assert lpips_mod.weights_available()
    loaded = lpips_mod.load_weights()
    img = rng.random((96, 96)).astype(np.float32)
    ref = rng.random((96, 96)).astype(np.float32)
    got = float(np.asarray(lpips_mod.lpips(loaded, img, ref))[0])
    assert got == pytest.approx(_torch_lpips(w, img, ref), abs=2e-5)
