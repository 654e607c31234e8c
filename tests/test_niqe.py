"""NIQE building-block tests (the pristine params file is external, so the
full score is exercised with synthetic pristine stats)."""

import numpy as np
import pytest

from evreal_tpu.metrics.niqe import (
    estimate_aggd,
    estimate_ggd,
    mscn,
    niqe,
    niqe_features,
)


def test_ggd_recovers_gaussian():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 2.0, 200000)
    alpha, sigma_sq = estimate_ggd(x)
    assert abs(alpha - 2.0) < 0.1  # Gaussian == GGD with alpha=2
    assert abs(sigma_sq - 4.0) < 0.1


def test_ggd_recovers_laplacian():
    rng = np.random.default_rng(1)
    x = rng.laplace(0, 1.0, 200000)
    alpha, _ = estimate_ggd(x)
    assert abs(alpha - 1.0) < 0.1


def test_aggd_symmetric_case():
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1.0, 200000)
    alpha, mean, sl, sr = estimate_aggd(x)
    assert abs(alpha - 2.0) < 0.15
    assert abs(mean) < 0.02
    assert abs(sl - sr) < 0.05


def test_aggd_asymmetric_case():
    rng = np.random.default_rng(3)
    left = -np.abs(rng.normal(0, 0.5, 100000))
    right = np.abs(rng.normal(0, 2.0, 100000))
    x = np.concatenate([left, right])
    _, mean, sl, sr = estimate_aggd(x)
    assert sr > sl * 2
    assert mean > 0


def test_mscn_whitens():
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 255, (128, 128))
    coeff, sigma = mscn(img)
    assert abs(coeff.mean()) < 0.05
    assert sigma.min() >= 0


def test_niqe_scores_distortion_higher():
    """With synthetic pristine stats from clean images, a noisy image must
    score farther from the model than another clean image."""
    rng = np.random.default_rng(5)

    def clean(seed):
        r = np.random.default_rng(seed)
        yy, xx = np.mgrid[0:96, 0:192].astype(np.float64)
        img = 0.5 + 0.3 * np.sin(xx / (8 + seed % 5)) * np.cos(yy / 11)
        img += r.normal(0, 0.01, img.shape)
        # smooth it to look "natural"
        from scipy.ndimage import gaussian_filter
        return np.clip(gaussian_filter(img, 1.0), 0, 1)

    feats = np.concatenate([niqe_features(clean(s)) for s in range(8)])
    mu = feats.mean(0)
    cov = np.cov(feats, rowvar=False) + np.eye(36) * 1e-6

    good = niqe(clean(100), mu, cov)
    noisy = niqe(np.clip(clean(100) + rng.normal(0, 0.2, (96, 192)), 0, 1),
                 mu, cov)
    assert noisy > good


def test_niqe_registered_fn_survives_vmap(tmp_path, monkeypatch):
    """The harness vmaps every metric fn over the chunk (runner.py
    metric_scores); the pure_callback must declare a vmap_method."""
    import jax
    import numpy as np

    from evreal_tpu.metrics import niqe as niqe_mod
    from evreal_tpu.metrics import registry

    rng = np.random.default_rng(0)
    feats = rng.normal(0, 1, (80, 36)).astype(np.float64)
    np.savez(tmp_path / "niqe_params.npz", mu=feats.mean(0),
             cov=np.cov(feats.T))
    monkeypatch.setenv("EVREAL_NIQE_PARAMS", str(tmp_path /
                                                 "niqe_params.npz"))
    assert niqe_mod.register_if_available()
    try:
        spec = registry._REGISTRY["niqe"]
        # 96x192 -> 2 patches (a single patch has no sample covariance and
        # correctly yields NaN, see test below)
        imgs = rng.random((3, 96, 192)).astype(np.float32)
        out = np.asarray(jax.vmap(spec.fn)(imgs))
        assert out.shape == (3,) and np.isfinite(out).all()
    finally:
        registry._REGISTRY.pop("niqe", None)


def test_niqe_single_selected_patch_is_nan():
    """One selected patch has no sample covariance (np.cov of a single row
    degenerates to a 0-d scalar); the score must be NaN — which the
    tracker's NaN filtering then drops, like pyiqa's n-1 normalization —
    not a silently wrong finite number."""
    rng = np.random.default_rng(6)
    mu = rng.normal(0, 1, 36)
    cov = np.eye(36)
    img = rng.random((96, 96))  # exactly one 96x96 patch
    assert np.isnan(niqe(img, mu, cov))


def test_niqe_registered_fn_nan_frame_contained(tmp_path, monkeypatch):
    """A frame the scorer cannot handle (e.g. the all-NaN zero-padded tail
    of a ragged chunk after robust normalization) must score NaN, not raise
    — a raise would kill the metric for the whole sequence."""
    import jax

    from evreal_tpu.metrics import niqe as niqe_mod
    from evreal_tpu.metrics import registry

    rng = np.random.default_rng(7)
    feats = rng.normal(0, 1, (80, 36)).astype(np.float64)
    np.savez(tmp_path / "niqe_params.npz", mu=feats.mean(0),
             cov=np.cov(feats.T))
    monkeypatch.setenv("EVREAL_NIQE_PARAMS",
                       str(tmp_path / "niqe_params.npz"))
    assert niqe_mod.register_if_available()
    try:
        spec = registry._REGISTRY["niqe"]
        imgs = np.stack([rng.random((96, 192)).astype(np.float32),
                         np.full((96, 192), np.nan, np.float32)])
        out = np.asarray(jax.vmap(spec.fn)(imgs))
        assert np.isfinite(out[0]) and np.isnan(out[1])
    finally:
        registry._REGISTRY.pop("niqe", None)


def test_niqe_partial_nan_rows_still_score():
    """MATLAB/pyiqa pair nanmean with NANCOV (complete rows only): a frame
    with some NaN patches must score from its valid patches, not lose the
    whole frame (np.cov over the full matrix goes all-NaN from one bad
    row — review finding)."""
    import numpy as np

    from evreal_tpu.metrics import niqe as niqe_mod

    rng = np.random.default_rng(0)
    img = rng.uniform(0.2, 0.8, (288, 288)).astype(np.float32)
    mu = np.zeros(36)
    cov = np.eye(36)
    full = niqe_mod.niqe(img, mu, cov)
    assert np.isfinite(full)

    # poison the interior of patch (0,0): the 7px MSCN filter spreads NaN
    # ~3px, contaminating a few neighboring patch rows at scale 2, but a
    # 3x3 patch grid keeps several rows fully valid
    img_nan = img.copy()
    img_nan[4:92, 4:92] = np.nan
    feats = niqe_mod.niqe_features(img_nan)
    nan_rows = np.isnan(feats).any(axis=1)
    assert nan_rows.any() and (~nan_rows).sum() >= 2  # genuinely partial
    score = niqe_mod.niqe(img_nan, mu, cov)
    assert np.isfinite(score)  # scored from the remaining valid patches


def test_niqe_too_small_frame_fails_at_trace():
    """A sequence whose frames cannot fit one 96px patch must fail loudly
    at trace time (registry validation), not produce an all-NaN column."""
    import numpy as np
    import pytest

    from evreal_tpu.metrics.registry import make_host_nr_metric

    fn = make_host_nr_metric("niqe", lambda im: 0.0, min_side=96)
    import jax

    with pytest.raises(ValueError, match="96 px"):
        jax.eval_shape(fn, np.zeros((64, 64), np.float32))
