"""BRISQUE: feature extraction properties, SVR math, registry gating."""

import numpy as np
import pytest

from evreal_tpu.metrics import brisque as bq


def test_feature_vector_shape_and_finiteness():
    rng = np.random.default_rng(0)
    img = rng.random((96, 128)).astype(np.float32)
    f = bq.brisque_features(img)
    assert f.shape == (36,)
    assert np.isfinite(f).all()
    # GGD alpha of the first scale is positive; variances non-negative
    assert f[0] > 0 and f[1] >= 0


def test_features_respond_to_blur():
    """Blur kills high-frequency MSCN structure: the GGD variance of the
    blurred image's coefficients drops."""
    import cv2

    rng = np.random.default_rng(1)
    img = rng.random((128, 128)).astype(np.float32)
    blurred = cv2.GaussianBlur(img, (11, 11), 3.0)
    f_sharp = bq.brisque_features(img)
    f_blur = bq.brisque_features(blurred)
    assert f_blur[1] < f_sharp[1]


def test_svr_score_matches_manual_rbf():
    rng = np.random.default_rng(2)
    n_sv = 7
    params = {
        "sv": rng.normal(0, 1, (n_sv, 36)),
        "sv_coef": rng.normal(0, 1, n_sv),
        "gamma": np.float64(0.05),
        "rho": np.float64(-0.3),
        "scale_min": np.full(36, -2.0),
        "scale_max": np.full(36, 2.0),
    }
    feats = rng.normal(0, 1, 36)
    x = -1 + 2 * (feats - params["scale_min"]) / (
        params["scale_max"] - params["scale_min"])
    want = sum(params["sv_coef"][i]
               * np.exp(-0.05 * np.sum((params["sv"][i] - x) ** 2))
               for i in range(n_sv)) - params["rho"]
    got = bq.svr_score(feats, params)
    assert got == pytest.approx(float(want), rel=1e-12)


def test_registry_gating_and_vmap(tmp_path, monkeypatch):
    import jax

    from evreal_tpu.metrics import registry

    rng = np.random.default_rng(3)
    np.savez(tmp_path / "brisque_svm.npz",
             sv=rng.normal(0, 1, (5, 36)),
             sv_coef=rng.normal(0, 1, 5),
             gamma=np.float64(0.1), rho=np.float64(0.0),
             scale_min=np.full(36, -5.0), scale_max=np.full(36, 5.0))
    monkeypatch.setenv("EVREAL_BRISQUE_PARAMS",
                       str(tmp_path / "brisque_svm.npz"))
    assert bq.register_if_available()
    try:
        spec = registry._REGISTRY["brisque"]
        assert spec.no_ref
        imgs = rng.random((3, 64, 64)).astype(np.float32)
        out = np.asarray(jax.vmap(spec.fn)(imgs))
        assert out.shape == (3,) and np.isfinite(out).all()
    finally:
        registry._REGISTRY.pop("brisque", None)


def test_gated_off_without_params(monkeypatch):
    monkeypatch.setenv("EVREAL_BRISQUE_PARAMS", "/nonexistent/file.npz")
    assert not bq.register_if_available()


def test_features_on_odd_dimensions():
    """Odd H/W (e.g. BS-ERGB's 625x970 frames) must not break the 2x2
    average-pool downsample between scales."""
    rng = np.random.default_rng(4)
    feats = bq.brisque_features(rng.random((97, 121)))
    assert feats.shape == (36,) and np.isfinite(feats).all()
