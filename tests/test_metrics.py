"""SSIM / MSE parity vs a scipy-based oracle implementing the exact skimage
algorithm the reference pins (gaussian_weights=True, sigma=1.5,
use_sample_covariance=False, data_range=1.0; skimage is not installed here,
but it delegates to scipy.ndimage.gaussian_filter which is)."""

import numpy as np
import pytest

from evreal_tpu.metrics.functional import mse, ssim


def skimage_ssim_oracle(x, y, data_range=1.0, sigma=1.5, truncate=3.5,
                        k1=0.01, k2=0.03):
    from scipy.ndimage import gaussian_filter

    x = x.astype(np.float64)
    y = y.astype(np.float64)
    f = lambda a: gaussian_filter(a, sigma, truncate=truncate)
    ux, uy = f(x), f(y)
    uxx, uyy, uxy = f(x * x), f(y * y), f(x * y)
    vx = uxx - ux * ux
    vy = uyy - uy * uy
    vxy = uxy - ux * uy
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
    radius = int(truncate * sigma + 0.5)
    return s[radius:-radius, radius:-radius].mean()


def test_ssim_matches_oracle():
    rng = np.random.default_rng(0)
    for seed in range(3):
        x = rng.uniform(0, 1, (64, 80)).astype(np.float32)
        y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)
        want = skimage_ssim_oracle(x, y)
        got = float(ssim(x, y))
        assert abs(got - want) < 1e-5, (got, want)


def test_ssim_identical_images():
    x = np.random.default_rng(1).uniform(0, 1, (32, 32)).astype(np.float32)
    assert abs(float(ssim(x, x)) - 1.0) < 1e-6


def test_mse():
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (50, 60)).astype(np.float32)
    b = rng.uniform(0, 1, (50, 60)).astype(np.float32)
    assert abs(float(mse(a, b)) - np.mean((a - b) ** 2)) < 1e-6


def test_broken_metric_is_dropped_not_fatal(capsys):
    """Per-metric containment (reference eval_metrics.py:233-242): a metric
    that fails to trace is skipped with a message; others still score."""
    import jax.numpy as jnp

    from evreal_tpu.harness.runner import MethodRunner
    from evreal_tpu.metrics.registry import MetricSpec
    from evreal_tpu.models import build_model
    from evreal_tpu.models.init import init_firenet

    model = build_model("FireNet", {"num_bins": 5, "base_num_channels": 8,
                                    "kernel_size": 3})
    runner = MethodRunner(model, init_firenet(base_num_channels=8),
                          event_norm=False, post_norm="none",
                          height=16, width=16, num_bins=5)

    def broken(img, ref):
        raise RuntimeError("boom")

    specs = [MetricSpec("mse", lambda a, b: jnp.mean((a - b) ** 2), False),
             MetricSpec("broken", broken, False)]
    imgs = jnp.zeros((3, 16, 16))
    out = runner.metric_scores(specs, imgs, imgs)
    assert set(out) == {"mse"}
    assert "broken" in capsys.readouterr().out


def test_ssim_tiny_sigma_finite():
    """radius=0 (sigma <= 1/7 at default truncate) must not produce an
    empty-slice NaN."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((16, 16), dtype=np.float64).astype(np.float32))
    v = float(ssim(a, a, sigma=0.1))
    assert np.isfinite(v) and v == pytest.approx(1.0, abs=1e-5)
