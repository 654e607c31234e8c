"""HyperE2VID dynamic-decoder components.

Reference: model/hyper/hyper_dynamic.py (context fusion, per-pixel dynamic
atoms over multiscale Fourier-Bessel bases, dynamic convolution) and
model/hyper/fourier_bessel.py (basis construction, itself translated from the
public DCFNet MATLAB code).

The Bessel-root table shipped with the reference (bessel.npy: rows of
``[k, q, j_{k,q}, j_{k,q+1}]``) is regenerated here from
``scipy.special.jn_zeros`` — only orders k <= 15 and small roots survive the
reference's own filtering, so a tiny generated table is exact.
"""

import functools

import jax.numpy as jnp
import numpy as np

from evreal_tpu.nn.layers import (
    activation_fn,
    batch_norm,
    conv2d,
    resize_bilinear,
    unfold,
)


@functools.lru_cache(maxsize=None)
def _bessel_table(kmax=15, qmax=32):
    # cached: 16 jn_zeros root solves, otherwise recomputed per scale per
    # call on the 1-core host
    from scipy.special import jn_zeros

    rows = []
    for k in range(kmax + 1):
        zeros = jn_zeros(k, qmax + 1)
        for q in range(1, qmax + 1):
            rows.append((float(k), float(q), zeros[q - 1], zeros[q]))
    return np.array(rows)


def calculate_fb_bases(l1):
    """Fourier-Bessel bases on a (2*l1+1)^2 grid, reference semantics."""
    from scipy import special

    max_k = (2 * l1 + 1) ** 2 - 1
    l = l1 + 1
    r = l1 + 0.5
    truncate_freq_factor = 2.0 if l1 < 2 else 1.5

    xx, yy = np.meshgrid(range(-l, l + 1), range(-l, l + 1))
    xx = xx / r
    yy = yy / r
    ugrid = np.concatenate([yy.reshape(-1, 1), xx.reshape(-1, 1)], 1)
    tgrid = np.arctan2(ugrid[:, 1], ugrid[:, 0])
    rgrid = np.sqrt(ugrid[:, 0] ** 2 + ugrid[:, 1] ** 2)

    table = _bessel_table()
    b = table[(table[:, 0] <= 15) & (table[:, 3] <= np.pi * r * truncate_freq_factor)]
    idx = np.argsort(b[:, 2])
    ang_freqs = b[idx, 0]
    r_ns = b[idx, 2]

    psi = []
    for i in range(b.shape[0]):
        ki = ang_freqs[i]
        f = special.jv(ki, rgrid * r_ns[i])
        phi = f / np.abs(special.jv(ki + 1, r_ns[i]))
        phi[rgrid >= 1] = 0
        if ki == 0:
            psi.append(phi)
        else:
            psi.append(phi * np.cos(ki * tgrid) * np.sqrt(2))
            psi.append(phi * np.sin(ki * tgrid) * np.sqrt(2))

    psi = np.array(psi)
    if psi.shape[0] > max_k:
        psi = psi[:max_k]
    num_bases = psi.shape[0]
    p = psi.reshape(num_bases, 2 * l + 1, 2 * l + 1).transpose(1, 2, 0)
    p = p[1:-1, 1:-1, :].reshape((2 * l1 + 1) ** 2, num_bases)
    c = np.sqrt(np.mean(np.sum(p ** 2, 0)))
    return p / c


def bases_list(ks, num_bases):
    """Multiscale FB bases, shape (num_scales*num_bases, ks*ks).

    Matches reference fourier_bessel.bases_list: per scale s (kernel
    (s+1)*2+1), take the first ``num_bases`` bases and zero-pad spatially to
    ks x ks.
    """
    len_list = ks // 2
    out = []
    for i in range(len_list):
        ksize = (i + 1) * 2 + 1
        normed = calculate_fb_bases(i + 1)  # (ksize^2, nb)
        normed = normed.T.reshape(-1, ksize, ksize).astype(np.float32)[:num_bases]
        pad = len_list - (i + 1)
        padded = np.pad(normed, ((0, 0), (pad, pad), (pad, pad)))
        out.append(padded.reshape(num_bases, ks * ks))
    return np.concatenate(out, 0)


def context_fusion(p, ev_tensor, prev_recs, downsample_factor=4):
    """ConvolutionalContextFusion (hyper_dynamic.py:7-23). NHWC."""
    ctx = jnp.concatenate([ev_tensor, prev_recs], axis=-1)
    n, h, w, _ = ctx.shape
    ctx = resize_bilinear(ctx, h // downsample_factor, w // downsample_factor)
    return conv2d(p["conv"], ctx, padding="same")


def dynamic_atom_generation(p, context, num_atoms=6):
    """DynamicAtomGeneration (hyper_dynamic.py:26-57). Returns per-pixel
    atoms (N, H, W, num_atoms, ks*ks)."""
    x = conv2d(p["bases_net"]["0"], context, padding="same")
    x = jnp.tanh(batch_norm(p["bases_net"]["1"], x))
    x = conv2d(p["bases_net"]["3"], x, padding="same")
    coeff = jnp.tanh(batch_norm(p["bases_net"]["4"], x))
    n, h, w, _ = coeff.shape
    k = p["bases"].shape[0]
    coeff = coeff.reshape(n, h, w, num_atoms, k)
    return jnp.einsum("nhwmk,kl->nhwml", coeff, p["bases"])


def dynamic_conv(p, x, atoms, kernel_size, padding, num_atoms=6):
    """DynamicConv (hyper_dynamic.py:60-92). NHWC."""
    n, h, w, c = x.shape
    patches = unfold(x, kernel_size, stride=1, padding=padding)
    patches = patches.reshape(n, h, w, c, kernel_size * kernel_size)
    inter = jnp.einsum("nhwml,nhwcl->nhwcm", atoms, patches)
    inter = inter.reshape(n, h, w, c * num_atoms)
    out = conv2d({"weight": p["compositional_coefficients"]}, inter)
    return out + p["bias"]


def dynamic_upsample_layer(p, x, ev_tensor, prev_recs, *, kernel_size,
                           padding, activation="relu", num_atoms=6):
    """DynamicUpsampleLayer (submodules.py:100-127)."""
    n, h, w, _ = x.shape
    up = resize_bilinear(x, 2 * h, 2 * w)
    ctx = context_fusion(p["context_fusion"], ev_tensor, prev_recs)
    atoms = dynamic_atom_generation(p["dynamic_atom_generation"], ctx,
                                    num_atoms)
    out = dynamic_conv(p["dynamic_conv"], up, atoms, kernel_size, padding,
                       num_atoms)
    act = activation_fn(activation)
    return act(out) if act is not None else out
