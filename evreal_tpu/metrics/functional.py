"""Device-side full-reference image metrics.

``ssim`` reimplements skimage.metrics.structural_similarity with the exact
configuration the reference pins (utils/eval_metrics.py:96):
``gaussian_weights=True, sigma=1.5, use_sample_covariance=False,
data_range=1.0`` — i.e. an 11-tap discrete Gaussian (truncate=3.5), scipy
'reflect' (= numpy 'symmetric') boundary, cov_norm=1, and the mean taken over
the pad-cropped SSIM map.

``mse`` is skimage.metrics.mean_squared_error.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def mse(img, ref):
    d = img.astype(jnp.float32) - ref.astype(jnp.float32)
    return jnp.mean(d * d)


@functools.lru_cache(maxsize=None)
def _gaussian_kernel(sigma=1.5, truncate=3.5):
    # numpy (not jnp) so the cache never captures a tracer; jit treats the
    # kernel as a compile-time constant.
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32), radius


def _filter2d(x, k, radius):
    """Separable Gaussian filter with scipy-'reflect' (symmetric) padding.
    x: (H, W)."""
    xp = jnp.pad(x, radius, mode="symmetric")
    # rows then cols, 'valid'
    xp = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(xp)
    xp = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"),
                  in_axes=1, out_axes=1)(xp)
    return xp


def ssim(img, ref, data_range=1.0, sigma=1.5, truncate=3.5, k1=0.01, k2=0.03):
    """SSIM of two 2-D images, skimage-exact for the reference config."""
    k, radius = _gaussian_kernel(sigma, truncate)
    if min(img.shape[-2:]) <= 2 * radius:
        # skimage raises here ('win_size exceeds image extent'); an empty
        # crop slice would otherwise return a silent NaN that flows into
        # the dataset means
        raise ValueError(
            f"ssim: image extent {tuple(img.shape[-2:])} too small for the "
            f"{2 * radius + 1}-px window (needs > {2 * radius} per side)")
    x = img.astype(jnp.float32)
    y = ref.astype(jnp.float32)
    f = lambda a: _filter2d(a, k, radius)
    ux, uy = f(x), f(y)
    uxx, uyy, uxy = f(x * x), f(y * y), f(x * y)
    vx = uxx - ux * ux
    vy = uyy - uy * uy
    vxy = uxy - ux * uy
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux * ux + uy * uy + c1) * (vx + vy + c2))
    pad = radius  # (win_size - 1) // 2 with win_size = 2*radius + 1
    if pad == 0:  # tiny sigma/truncate: s[0:-0] would be an empty slice
        return jnp.mean(s)
    return jnp.mean(s[pad:-pad, pad:-pad])
