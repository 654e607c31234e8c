"""BRISQUE no-reference metric — native counterpart of the pyiqa metric the
reference pulls in for its Table-3 commands (README.md:99-102, via the
PyIqaMetricFactory at utils/eval_metrics.py:100-159).

Features: 18 per scale x 2 scales — GGD (alpha, sigma^2) of the MSCN
coefficients plus AGGD (alpha, mean, l_var, r_var) of the 4 directional
pairwise products, computed over the whole image; scale 2 is a 2x
downsample. Scoring: libsvm-style RBF support-vector regression on the
[-1, 1]-scaled features.

The trained SVR (support vectors, coefficients, gamma, rho, feature ranges)
is data that cannot be derived in-repo; convert it from pyiqa with
``tools/convert_brisque.py`` to ``weights/brisque_svm.npz``. Absent params
gate the metric off, like NIQE and LPIPS. Deliberate divergence: the 2x
downsample uses average pooling (the original uses MATLAB imresize /
bicubic), which shifts absolute scores slightly.
"""

import os

import numpy as np

from evreal_tpu.metrics.niqe import _patch_features, mscn

DEFAULT_PARAMS = os.path.join(os.path.dirname(__file__), os.pardir,
                              os.pardir, "weights", "brisque_svm.npz")


def params_available(path=None):
    return os.path.exists(path or os.environ.get("EVREAL_BRISQUE_PARAMS",
                                                 DEFAULT_PARAMS))


def load_params(path=None):
    path = path or os.environ.get("EVREAL_BRISQUE_PARAMS", DEFAULT_PARAMS)
    d = np.load(path)
    return {k: d[k] for k in d.files}


def brisque_features(img):
    """36-dim BRISQUE feature vector of a [0,1] grayscale image."""
    img = np.asarray(img, np.float64) * 255.0
    feats = []
    for scale in (1, 2):
        coeff, _ = mscn(img)
        # GGD of MSCN + AGGD of the 4 directional products: the same
        # 18-feature block as one whole-image NIQE "patch"
        feats += _patch_features(coeff)
        if scale == 1:  # downsample only between the scales
            # truncate odd dims (e.g. BS-ERGB's 625x970 frames) so the
            # 2x2 average-pool halving below broadcasts
            img = img[: img.shape[0] // 2 * 2, : img.shape[1] // 2 * 2]
            img = 0.25 * (img[0::2, 0::2] + img[1::2, 0::2]
                          + img[0::2, 1::2] + img[1::2, 1::2])
    return np.asarray(feats, np.float64)


def svr_score(feats, params):
    """libsvm RBF epsilon-SVR decision value for one feature vector."""
    lo, hi = params["scale_min"], params["scale_max"]
    x = -1.0 + 2.0 * (feats - lo) / (hi - lo)
    d = params["sv"] - x  # (n_sv, 36)
    k = np.exp(-params["gamma"] * np.sum(d * d, axis=1))
    return float(params["sv_coef"] @ k - params["rho"])


def brisque(img, params):
    return svr_score(brisque_features(img), params)


def register_if_available():
    """Register 'brisque' as a host-side metric when SVR params exist
    (shared containment wrapper: registry.make_host_nr_metric)."""
    if not params_available():
        return False
    from evreal_tpu.metrics.registry import make_host_nr_metric, register

    params = load_params()
    register("brisque",
             make_host_nr_metric("brisque",
                                 lambda im: brisque(im, params)),
             no_ref=True)
    return True
