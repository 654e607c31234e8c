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

from evreal_tpu.metrics.niqe import estimate_aggd, estimate_ggd, mscn

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
        alpha, sigma_sq = estimate_ggd(coeff.ravel())
        feats += [alpha, sigma_sq]
        for dy, dx in ((0, 1), (1, 0), (1, 1), (1, -1)):  # H, V, D1, D2
            shifted = np.roll(np.roll(coeff, dy, axis=0), dx, axis=1)
            feats += list(estimate_aggd((coeff * shifted).ravel()))
        # truncate odd dims (e.g. BS-ERGB's 625x970 frames) so the 2x2
        # average-pool halving below broadcasts
        img = img[: img.shape[0] // 2 * 2, : img.shape[1] // 2 * 2]
        img = 0.25 * (img[0::2, 0::2] + img[1::2, 0::2] + img[0::2, 1::2]
                      + img[1::2, 1::2])
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
    """Register 'brisque' as a host-side metric when SVR params exist."""
    if not params_available():
        return False
    from evreal_tpu.metrics.registry import register

    params = load_params()

    warned = []

    def fn(img):
        import jax

        def host(im):
            # per-frame failures become NaN (dropped by the tracker), not a
            # raise that would kill the metric for the sequence — see the
            # matching comment in niqe.py (padded-tail frames can be NaN)
            try:
                return np.float32(brisque(np.asarray(im), params))
            except Exception as exc:  # noqa: BLE001
                if not warned:
                    warned.append(True)
                    print(f"brisque failed on a frame ({exc}); scoring NaN")
                return np.float32("nan")

        # vmap_method: the harness vmaps metric fns over the chunk
        return jax.pure_callback(host, np.zeros((), np.float32), img,
                                 vmap_method="sequential")

    register("brisque", fn, no_ref=True)
    return True
