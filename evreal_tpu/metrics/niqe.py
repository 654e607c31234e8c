"""NIQE (Naturalness Image Quality Evaluator) — no-reference metric.

Canonical algorithm (Mittal et al. 2013, as in the MATLAB release and
pyiqa's port, which the reference exposes through its pyiqa factory,
utils/eval_metrics.py:100-159):

  1. MSCN coefficients: (I - mu) / (sigma + 1) with a 7x7 Gaussian
     (sigma = 7/6) local mean/std, at two scales (original + 2x downsample).
  2. Per 96x96 patch: GGD fit of MSCN (2 features) + AGGD fits of the four
     pairwise products H/V/D1/D2 (4 features each) -> 18 features/scale.
  3. First-scale patch selection by local sharpness > 0.75 * peak.
  4. Quality = sqrt((mu_p - mu_d)^T ((S_p + S_d)/2)^-1 (mu_p - mu_d)) against
     the pristine multivariate-Gaussian model.

The pristine model parameters (mu 1x36, cov 36x36) ship with the original
release (``niqe_image_params.mat``) and cannot be derived here; convert them
with ``tools/convert_niqe.py`` to ``weights/niqe_params.npz``. The metric
registers itself only when that file exists.

Feature extraction runs in numpy on host (patch statistics are tiny); inputs
are HxW grayscale in [0, 1].

Open parity question (unverifiable without pyiqa in this image): features
here are computed on continuous ``img * 255`` floats, while the MATLAB
pipeline consumes uint8 — whether pyiqa rounds to integers before MSCN
decides a small systematic offset. ``tools/convert_niqe.py`` asserts
numeric parity wherever pyiqa IS available; settle it there.
"""

import os

import numpy as np
from scipy.ndimage import correlate1d

DEFAULT_PARAMS = os.path.join(os.path.dirname(__file__), os.pardir,
                              os.pardir, "weights", "niqe_params.npz")

_GAMMA_RANGE = np.arange(0.2, 10.001, 0.001)


def params_available(path=None):
    return os.path.exists(path or os.environ.get("EVREAL_NIQE_PARAMS",
                                                 DEFAULT_PARAMS))


def load_params(path=None):
    data = np.load(path or os.environ.get("EVREAL_NIQE_PARAMS",
                                          DEFAULT_PARAMS))
    return data["mu"].reshape(-1), data["cov"]


def _gamma(x):
    from scipy.special import gamma

    return gamma(x)


_R_GAM = None


def _r_gam():
    global _R_GAM
    if _R_GAM is None:
        g = _GAMMA_RANGE
        _R_GAM = (_gamma(2.0 / g) ** 2) / (_gamma(1.0 / g) * _gamma(3.0 / g))
    return _R_GAM


def estimate_ggd(vec):
    """Generalized Gaussian fit -> (alpha, sigma^2) by moment matching."""
    sigma_sq = np.mean(vec ** 2)
    sigma = np.sqrt(sigma_sq)
    e = np.mean(np.abs(vec))
    rho = sigma_sq / (e ** 2 + 1e-12)
    diff = np.abs(rho - 1.0 / _r_gam())
    alpha = _GAMMA_RANGE[np.argmin(diff)]
    return alpha, sigma_sq


def estimate_aggd(vec):
    """Asymmetric GGD fit -> (alpha, mean, sigma_l^2, sigma_r^2)."""
    left = vec[vec < 0]
    right = vec[vec > 0]
    sigma_l = np.sqrt(np.mean(left ** 2)) if left.size else 0.0
    sigma_r = np.sqrt(np.mean(right ** 2)) if right.size else 0.0
    gamma_hat = sigma_l / sigma_r if sigma_r > 0 else np.inf
    e = np.mean(np.abs(vec))
    rhat = (e ** 2) / np.mean(vec ** 2) if np.mean(vec ** 2) > 0 else 0.0
    rhat_norm = (rhat * (gamma_hat ** 3 + 1) * (gamma_hat + 1)
                 / ((gamma_hat ** 2 + 1) ** 2)) if np.isfinite(gamma_hat) \
        else rhat
    g = _GAMMA_RANGE
    diff = (_r_gam() - rhat_norm) ** 2
    alpha = g[np.argmin(diff)]
    const = np.sqrt(_gamma(1.0 / alpha) / _gamma(3.0 / alpha))
    mean = (sigma_r - sigma_l) * (_gamma(2.0 / alpha) / _gamma(1.0 / alpha)) \
        * const
    return alpha, mean, sigma_l ** 2, sigma_r ** 2


def _gaussian_window(size=7, sigma=7.0 / 6.0):
    x = np.arange(size) - size // 2
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return k / k.sum()


def mscn(img, eps=1.0):
    """Mean-subtracted contrast-normalized coefficients + local sigma."""
    k = _gaussian_window()
    f = lambda a: correlate1d(correlate1d(a, k, axis=0, mode="nearest"),
                              k, axis=1, mode="nearest")
    mu = f(img)
    sigma = np.sqrt(np.abs(f(img * img) - mu * mu))
    return (img - mu) / (sigma + eps), sigma


def _patch_features(patch):
    feats = []
    alpha, sigma_sq = estimate_ggd(patch.ravel())
    feats += [alpha, sigma_sq]
    shifts = [(0, 1), (1, 0), (1, 1), (1, -1)]  # H, V, D1, D2
    for dy, dx in shifts:
        shifted = np.roll(np.roll(patch, dy, axis=0), dx, axis=1)
        prod = (patch * shifted).ravel()
        feats += list(estimate_aggd(prod))
    return feats


def niqe_features(img, patch_size=96, sharpness_thresh=0.75):
    """36-dim NIQE feature means over selected patches of a [0,1] image."""
    img = np.asarray(img, np.float64) * 255.0
    h, w = img.shape
    n_ph, n_pw = h // patch_size, w // patch_size
    img = img[: n_ph * patch_size, : n_pw * patch_size]
    if n_ph == 0 or n_pw == 0:
        raise ValueError(f"image {h}x{w} smaller than NIQE patch "
                         f"{patch_size}")

    feats_all = []
    sharpness = None
    for scale in (1, 2):
        coeff, sigma = mscn(img)
        ps = patch_size // scale
        feats_scale = []
        sharp_scale = []
        for py in range(n_ph):
            for px in range(n_pw):
                patch = coeff[py * ps:(py + 1) * ps, px * ps:(px + 1) * ps]
                feats_scale.append(_patch_features(patch))
                if scale == 1:  # only scale-1 sharpness selects patches
                    sharp_scale.append(sigma[py * ps:(py + 1) * ps,
                                             px * ps:(px + 1) * ps].mean())
        feats_all.append(np.array(feats_scale))
        if scale == 1:
            sharpness = np.array(sharp_scale)
            # 2x downsample (average pooling, as in the MATLAB imresize
            # approx) — only between the scales, not after the last
            img = 0.25 * (img[0::2, 0::2] + img[1::2, 0::2]
                          + img[0::2, 1::2] + img[1::2, 1::2])

    select = sharpness > sharpness_thresh * sharpness.max()
    if not np.any(select):
        select = np.ones_like(sharpness, bool)
    feats = np.concatenate([f[select] for f in feats_all], axis=1)
    return feats


def niqe(img, mu_pris, cov_pris):
    feats = niqe_features(img)
    # MATLAB/pyiqa pair nanmean with NANCOV (complete rows only): a frame
    # with a few NaN patches is scored from its valid patches, not lost —
    # np.cov over the full matrix would go all-NaN from one bad row
    valid = feats[~np.isnan(feats).any(axis=1)]
    if valid.shape[0] < 2:
        # Sample covariance is undefined below two complete rows (np.cov on
        # a single row degenerates to a 0-d scalar); pyiqa's n-1
        # normalization yields NaN here, which the tracker's NaN filtering
        # then drops (reference semantics, utils/eval_metrics.py:51).
        return float("nan")
    import warnings

    with warnings.catch_warnings():
        # an all-NaN feature column still makes nanmean warn "Mean of
        # empty slice" on its way to the NaN result the tracker drops —
        # expected noise for that contained case
        warnings.simplefilter("ignore", RuntimeWarning)
        mu_d = np.nanmean(feats, axis=0)
        cov_d = np.cov(valid, rowvar=False)
    pooled = (cov_pris + cov_d) / 2.0
    d = mu_pris - mu_d
    inv = np.linalg.pinv(pooled)
    return float(np.sqrt(max(d @ inv @ d, 0.0)))


def register_if_available():
    """Register 'niqe' as a host-side metric when params exist (shared
    containment wrapper: registry.make_host_nr_metric; min_side turns the
    too-small-frame case into a loud trace-time error)."""
    if not params_available():
        return False
    from evreal_tpu.metrics.registry import make_host_nr_metric, register

    mu, cov = load_params()
    register("niqe",
             make_host_nr_metric("niqe", lambda im: niqe(im, mu, cov),
                                 min_side=96),
             no_ref=True)
    return True
