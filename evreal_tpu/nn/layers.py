"""Functional NN layers (NHWC, HWIO kernels), inference semantics.

Parameter trees are nested dicts keyed by the reference's torch module paths
(e.g. ``{'conv2d': {'weight': ..., 'bias': ...}}``) so converted checkpoints
drop in directly; tensors are pre-transposed to JAX conventions by
``evreal_tpu.convert`` (conv OIHW -> HWIO, linear (O,I) -> (I,O)).

Semantics mirror the reference building blocks (EVREAL model/submodules.py):
ConvLayer / UpsampleConvLayer / TransposedConvLayer / ResidualBlock and the
norm variants they use, all in eval mode (BatchNorm & tracked InstanceNorm use
running statistics).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_EPS_BN = 1e-5

ACTIVATIONS = {
    None: None,
    "": None,
    "none": None,
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
}


def activation_fn(name):
    if callable(name):
        return name
    if name in ACTIVATIONS:
        return ACTIVATIONS[name]
    # the reference resolves any torch function name via getattr(torch, name)
    # (unet.py:34, e.g. final_activation='exp'); mirror that against jnp /
    # jax.nn, failing clearly instead of a KeyError inside a trace
    fn = getattr(jnp, name, None) or getattr(jax.nn, name, None)
    if fn is None or not callable(fn):  # e.g. 'pi' resolves to a constant
        raise ValueError(f"unknown activation {name!r} (not in "
                         f"{sorted(k for k in ACTIVATIONS if k)}, jnp, "
                         f"or jax.nn)")
    return fn


def conv2d(p, x, stride=1, padding=0, dilation=1):
    """2-D convolution. x: NHWC, p['weight']: HWIO, optional p['bias']."""
    if padding == "same":
        # torch Conv2d(padding='same') convention: even kernels pad the
        # extra element on the bottom/right (all current callers are odd-k,
        # where this reduces to the symmetric (k-1)//2)
        kh, kw = p["weight"].shape[:2]
        pad = [((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)]
    else:
        if isinstance(padding, int):
            padding = (padding, padding)
        pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    out = lax.conv_general_dilated(
        x, p["weight"], (stride, stride), pad,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p and p["bias"] is not None:
        out = out + p["bias"]
    return out


def conv_transpose2d(p, x, stride=2, padding=0, output_padding=1):
    """Matches torch ConvTranspose2d. p['weight'] is stored HWIO with the
    spatial flip already applied by the converter (see convert/torch_ckpt.py),
    so this reduces to an input-dilated convolution."""
    k = p["weight"].shape[0]
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    out = lax.conv_general_dilated(
        x, p["weight"], (1, 1), [(lo, hi), (lo, hi)],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p and p["bias"] is not None:
        out = out + p["bias"]
    return out


def linear(p, x):
    """p['weight']: (I, O) pre-transposed."""
    out = x @ p["weight"]
    if "bias" in p and p["bias"] is not None:
        out = out + p["bias"]
    return out


def batch_norm(p, x):
    """Eval-mode BatchNorm2d over NHWC channels using running statistics."""
    inv = lax.rsqrt(p["running_var"] + _EPS_BN)
    out = (x - p["running_mean"]) * inv
    if "weight" in p and p["weight"] is not None:
        out = out * p["weight"]
    if "bias" in p and p["bias"] is not None:
        out = out + p["bias"]
    return out


def instance_norm_tracked(p, x):
    """InstanceNorm2d(track_running_stats=True) in eval mode == running-stat
    normalization (affine=False by torch default)."""
    inv = lax.rsqrt(p["running_var"] + _EPS_BN)
    out = (x - p["running_mean"]) * inv
    if "weight" in p:
        out = out * p["weight"] + p["bias"]
    return out


def instance_norm(x):
    """InstanceNorm2d(track_running_stats=False): per-sample, per-channel
    statistics over H, W even in eval mode; no affine."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * lax.rsqrt(var + _EPS_BN)


def layer_norm(p, x):
    """torch nn.LayerNorm over the last dim, eps=1e-5."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * lax.rsqrt(var + 1e-5) * p["weight"] + p["bias"]


def _apply_norm(p, x, norm, tracked_in=True):
    if norm == "BN":
        return batch_norm(p["norm_layer"], x)
    if norm == "IN":
        if tracked_in:
            return instance_norm_tracked(p["norm_layer"], x)
        return instance_norm(x)
    return x


def _up2x_axis(x, axis):
    """Exact 2x bilinear upsample (half-pixel centers, edge clamp) along one
    axis via the two-phase decomposition: out[2i] = .25 x[i-1] + .75 x[i],
    out[2i+1] = .75 x[i] + .25 x[i+1]. Four fused multiply-adds per output
    instead of the dense (in, out) interpolation matmul jax.image.resize
    lowers to — same values, VPU-only."""
    first = lax.slice_in_dim(x, 0, 1, axis=axis)
    last = lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)
    prev = lax.concatenate([first, lax.slice_in_dim(
        x, 0, x.shape[axis] - 1, axis=axis)], axis)
    nxt = lax.concatenate([lax.slice_in_dim(
        x, 1, x.shape[axis], axis=axis), last], axis)
    even = 0.25 * prev + 0.75 * x
    odd = 0.75 * x + 0.25 * nxt
    # interleave even/odd along `axis`
    stacked = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


def upsample2x_bilinear(x):
    """2x bilinear upsample of NHWC, bit-matching torch
    F.interpolate(scale_factor=2, mode='bilinear', align_corners=False) up
    to f32 rounding (the general path computes the same 4-tap blend through
    jax.image.resize's interpolation matmul).

    NOT dispatched by default: substituting it into the batched E2VID
    lockstep program (b16, scan unroll 4) took the XLA TPU compile to
    ~30-60 min vs ~25 s for the jax.image.resize form, and the compiled
    program still measured ~5% slower in an interleaved A/B (2026-08-19,
    BASELINE.md "Tried and rejected") — the pipelines are HBM-bound, so
    removing the interpolation-matmul MXU passes buys nothing while the
    interleave materializations cost bandwidth. Kept (with its parity
    test) as the documented alternative for op-latency-bound deployments
    off this toolchain."""
    return _up2x_axis(_up2x_axis(x, 1), 2)


def resize_bilinear(x, out_h, out_w):
    """torch F.interpolate(mode='bilinear', align_corners=False) equivalent
    (no antialiasing on downsample, half-pixel centers). x: NHWC."""
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, out_h, out_w, c), method="bilinear",
                            antialias=False)


def resize_nearest(x, out_h, out_w):
    """torch F.interpolate(mode='nearest'): src = floor(dst * in/out).
    Identity sizes return x directly (value-identical; torch too) — SPADE's
    full-res block otherwise pays two dead full-tensor gathers per frame in
    the op-dispatch-bound batch-1 regime."""
    h, w = x.shape[1], x.shape[2]
    if (out_h, out_w) == (h, w):
        return x
    rows = jnp.floor(jnp.arange(out_h) * (h / out_h)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(out_w) * (w / out_w)).astype(jnp.int32)
    return x[:, rows][:, :, cols]


def fused_pair_conv(pa, pb, x, *, padding):
    """Two same-shaped convs reading the SAME input, fused into one conv
    by concatenating kernels along the output axis — channelwise-identical
    math, one dispatch instead of two (the ConvGRU-gate / SPADE-gamma-beta
    lever, BASELINE.md). Returns the two output halves. Falls back to the
    separate convs when bias presence mismatches (a fused bias cannot
    represent half-biased output channels)."""
    a_bias, b_bias = pa.get("bias"), pb.get("bias")
    if (a_bias is None) == (b_bias is None):
        fused = {"weight": jnp.concatenate([pa["weight"], pb["weight"]],
                                           axis=3)}
        if a_bias is not None:
            fused["bias"] = jnp.concatenate([a_bias, b_bias])
        return tuple(jnp.split(conv2d(fused, x, padding=padding), 2,
                               axis=-1))
    return conv2d(pa, x, padding=padding), conv2d(pb, x, padding=padding)


def pixel_shuffle(x, r):
    """torch nn.PixelShuffle on NHWC: (N,H,W,C*r^2) -> (N,H*r,W*r,C) with
    torch channel ordering out[..., c] <- in[..., c*r^2 + i*r + j]."""
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r, w, r, c
    return x.reshape(n, h * r, w * r, c)


def unfold(x, kernel_size, stride=1, padding=0):
    """torch F.unfold equivalent: NHWC -> (N, H', W', C*k*k) patches with
    torch's (C, kh, kw) channel-major patch ordering."""
    if isinstance(padding, int):
        padding = (padding, padding)
    patches = lax.conv_general_dilated_patches(
        x, (kernel_size, kernel_size), (stride, stride),
        [(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # conv_general_dilated_patches yields channels ordered as (C, kh, kw)
    # with spatial-minor layout, matching torch unfold's ordering.
    return patches


# ---------------------------------------------------------------------------
# Space-to-depth conv lowering (EVREAL_S2D).
#
# The b128 bf16 chunk-program profile (BASELINE.md per-kernel cost table)
# shows exactly one soft MXU kernel: the full-resolution 64ch->32 k5 decoder
# conv (72.6 TF/s vs 150-186 for its siblings) — the classic low-channel x
# large-spatial tiling weakness. Re-expressing the k5 stride-1 conv on
# 2x2-packed inputs (channels x4, spatial /4) turns it into a k3 conv at
# 256ch->128 — MXU-friendly tile shapes — at 1.44x the MAC count (the
# repacked 3x3 block kernel stores the 5x5 taps sparsely). Exact same math
# per output element (each output is the identical 25*C-term sum), including
# borders: full-res zero-padding by 2 is exactly one zero block row/col in
# packed space, so packed k3 pad-1 reproduces it when H and W are even.
# ---------------------------------------------------------------------------

# Static (u, v, r, s, a, b) -> (row, col) tap map for the weight repack:
# out[2i+a, 2j+b] draws tap dy = 2u+r-a - 2 (u in 0..2 encoding block offset
# u-1), i.e. w5 row index 2u+r-a, valid when in [0, 4].
_S2D_ROW = (2 * np.arange(3).reshape(3, 1, 1, 1, 1, 1)
            + np.arange(2).reshape(1, 1, 2, 1, 1, 1)
            - np.arange(2).reshape(1, 1, 1, 1, 2, 1))
_S2D_COL = (2 * np.arange(3).reshape(1, 3, 1, 1, 1, 1)
            + np.arange(2).reshape(1, 1, 1, 2, 1, 1)
            - np.arange(2).reshape(1, 1, 1, 1, 1, 2))
_S2D_MASK, _ = np.broadcast_arrays(
    (_S2D_ROW >= 0) & (_S2D_ROW <= 4) & (_S2D_COL >= 0) & (_S2D_COL <= 4),
    _S2D_ROW + _S2D_COL)
_S2D_ROWC = np.clip(_S2D_ROW, 0, 4)
_S2D_COLC = np.clip(_S2D_COL, 0, 4)


def _s2d_weight(w5):
    """(5,5,C,Co) HWIO kernel -> (3,3,4C,4Co) packed-block kernel.

    One gather + one select at trace time (~1.2 MB for the 64->32 decoder);
    inside a scan body XLA sees it as loop-invariant elementwise work."""
    c, co = w5.shape[2], w5.shape[3]
    w6 = w5[_S2D_ROWC, _S2D_COLC]          # (3,3,2,2,2,2,C,Co)
    mask = jnp.asarray(_S2D_MASK)[..., None, None]
    w6 = jnp.where(mask, w6, jnp.zeros((), w5.dtype))
    # channel layouts: in = (r*2+s)*C + c, out = (a*2+b)*Co + o
    w6 = w6.transpose(0, 1, 2, 3, 6, 4, 5, 7)  # u,v,r,s,C,a,b,Co
    return w6.reshape(3, 3, 4 * c, 4 * co)


def _s2d_pack(x):
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)       # n, Hb, Wb, r, s, c
    return x.reshape(n, h // 2, w // 2, 4 * c)


def _s2d_unpack(y, co):
    n, hb, wb, _ = y.shape
    y = y.reshape(n, hb, wb, 2, 2, co)
    y = y.transpose(0, 1, 3, 2, 4, 5)        # n, Hb, a, Wb, b, o
    return y.reshape(n, hb * 2, wb * 2, co)


def conv2d_s2d(p, x):
    """k5 stride-1 pad-2 conv as an exact space-to-depth k3 packed conv.

    Bit-level: each output element sums the identical 25*C products as
    conv2d; only the MXU accumulation order may differ (parity-tested to
    f32 rounding in tests/test_layers.py)."""
    w5 = p["weight"]
    out = lax.conv_general_dilated(
        _s2d_pack(x), _s2d_weight(w5), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = _s2d_unpack(out, w5.shape[3])
    if "bias" in p and p["bias"] is not None:
        out = out + p["bias"]
    return out


def _s2d_max_in():
    """EVREAL_S2D = max input channel count to repack (0/unset = off).

    Measured (BASELINE.md round 4): the repack only targets the one soft
    kernel — set 64 to repack the full-res 64->32 decoder conv and leave
    the roofline-bound h/2 and h/4 decoders alone."""
    raw = os.environ.get("EVREAL_S2D", "0")
    try:
        return int(raw)
    except ValueError:
        raise ValueError(f"EVREAL_S2D={raw!r}: expected an integer "
                         "(max in-channels to space-to-depth repack; 0=off)")


def _s2d_applicable(p, x, stride, padding):
    # _s2d_max_in() first: a malformed EVREAL_S2D must fail loudly even
    # when no k5/pad-2 layer is ever hit (same rule as EVREAL_UPFUSE)
    max_in = _s2d_max_in()
    w = p["weight"]
    return (stride == 1 and padding in (2, (2, 2))
            and w.shape[0] == 5 and w.shape[1] == 5
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
            and w.shape[2] <= max_in)


# ---------------------------------------------------------------------------
# Fused 2x-bilinear-upsample + k5 conv (EVREAL_UPFUSE).
#
# UpsampleConvLayer (reference submodules.py:69-97) is 2x bilinear resize then
# a k5 pad-2 conv. The bilinear is a 2-phase 2-tap linear map per axis
# (out[2p] = .25 x[p-1] + .75 x[p], out[2p+1] = .75 x[p] + .25 x[p+1], edges
# clamped), so the resize composes INTO the conv: fold the 4-tap blend into
# the 5x5 kernel and run ONE k5 conv on the pre-upsample grid emitting the 4
# output phases as channels — (H, W, C) -> (H, W, 4*Co), depth-to-space to
# (2H, 2W, Co). Exactly 25*C*4Co MACs per input pixel = the full-res conv's
# MAC count (1.0x, unlike the 1.44x S2D repack above), the HBM-bound resize
# kernels are gone (0.029 ms/frame in the b128 bf16 chunk profile,
# BASELINE.md), and the one soft MXU kernel (full-res 64->32 k5, 72.6 TF/s)
# becomes a half-res 64->128 conv with MXU-friendly channel tiles.
#
# Translation invariance breaks only where the conv's zero padding meets the
# resize's edge clamp (no single padded input reproduces both: up[-1] must be
# 0 for the conv pad while up[0] = x[0] needs the clamp — contradictory
# 2-tap constraints on any virtual x[-1]). The composed conv therefore runs
# on x edge-replicated by 1 then zero-padded by 1 (exact for all interior
# outputs), and the outermost 2-pixel output frame is recomputed exactly by
# four thin band convs over true upsampled strips and pasted in place.
# ---------------------------------------------------------------------------

def _upfuse_row_map():
    """A[a, dy, u]: coefficient of padded-input tap u (over XP = zero-pad-1 o
    replicate-1(x)) in output phase a's composed kernel row, for original
    kernel row dy. Rows sum to 1 (the bilinear taps are a partition)."""
    a_map = np.zeros((2, 5, 5), np.float64)
    g = ((0.25, 0.75), (0.75, 0.25))  # even/odd up-phase taps
    for a in range(2):
        for dy in range(5):
            dyp = a + dy - 2            # up-row offset relative to 2i
            r = dyp & 1
            p_blk = (dyp - r) >> 1
            for alpha in range(2):
                a_map[a, dy, p_blk + 1 + r + alpha] += g[r][alpha]
    return a_map


_UPFUSE_A = _upfuse_row_map()


def _upfuse_weight(w5):
    """(5,5,C,Co) HWIO kernel -> (5,5,C,4Co) composed kernel over the
    replicate+zero padded half-res grid; output channels phase-major
    ((a*2+b)*Co + o), matching _s2d_unpack. Loop-invariant inside scan."""
    a_coef = jnp.asarray(_UPFUSE_A, jnp.float32)
    wc = jnp.einsum("adu,bev,deco->uvcabo", a_coef, a_coef,
                    w5.astype(jnp.float32))
    c, co = w5.shape[2], w5.shape[3]
    return wc.reshape(5, 5, c, 4 * co).astype(w5.dtype)


def _upfuse_pad(x):
    """Edge-replicate by 1 then zero-pad by 1 on both spatial axes."""
    x = jnp.concatenate([x[:, :1], x, x[:, -1:]], axis=1)
    x = jnp.concatenate([x[:, :, :1], x, x[:, :, -1:]], axis=2)
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))


def _conv_valid(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _upfuse_borders(w5, x, y):
    """Overwrite the 2-px output frame of y with the exact
    conv(zero-pad-2(upsample2x(x))) values via thin band convs."""
    h, w = x.shape[1], x.shape[2]

    def zpad(s, rows, cols):
        return jnp.pad(s, ((0, 0), rows, cols, (0, 0)))

    # top/bottom: true up rows adjacent to the boundary come from 3 x-rows
    # (the strip contains the real clamp edge, so its resize is exact there)
    top = resize_bilinear(x[:, :3], 6, 2 * w)[:, :4]
    bot = resize_bilinear(x[:, -3:], 6, 2 * w)[:, 2:]
    y = y.at[:, :2].set(_conv_valid(zpad(top, (2, 0), (2, 2)), w5))
    y = y.at[:, -2:].set(_conv_valid(zpad(bot, (0, 2), (2, 2)), w5))
    left = resize_bilinear(x[:, :, :3], 2 * h, 6)[:, :, :4]
    right = resize_bilinear(x[:, :, -3:], 2 * h, 6)[:, :, 2:]
    # the row bands above already fixed the corners; the column bands
    # recompute them identically (both are the true values)
    y = y.at[:, :, :2].set(_conv_valid(zpad(left, (2, 2), (2, 0)), w5))
    y = y.at[:, :, -2:].set(_conv_valid(zpad(right, (2, 2), (0, 2)), w5))
    return y


def upsample_conv2x_fused(p, x):
    """2x bilinear upsample + k5 pad-2 conv as one composed conv on the
    pre-upsample grid. Same per-output math as resize_bilinear -> conv2d
    up to fp reassociation (the 4-tap blend folds into the kernel);
    parity-tested in tests/test_upfuse.py."""
    w5 = p["weight"]
    y = _s2d_unpack(_conv_valid(_upfuse_pad(x), _upfuse_weight(w5)),
                    w5.shape[3])
    y = _upfuse_borders(w5, x, y)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"]
    return y


def _upfuse_on():
    raw = os.environ.get("EVREAL_UPFUSE", "0")
    if raw not in ("0", "1"):
        raise ValueError(f"EVREAL_UPFUSE={raw!r}: expected 0|1 "
                         "(fold the 2x bilinear upsample into the k5 conv)")
    return raw == "1"


def _upfuse_applicable(p, x, padding):
    # _upfuse_on() first: a malformed EVREAL_UPFUSE must fail loudly even
    # when no k5/pad-2 layer is ever hit (ADVICE r04)
    if not _upfuse_on():
        return False
    w = p["weight"]
    return (padding in (2, (2, 2)) and w.shape[0] == 5 and w.shape[1] == 5
            and x.shape[1] >= 3 and x.shape[2] >= 3)


# ---------------------------------------------------------------------------
# Reference composite blocks (model/submodules.py).
# ---------------------------------------------------------------------------

def conv_layer(p, x, *, stride=1, padding=0, activation="relu", norm=None):
    """ConvLayer (submodules.py:8-35): conv -> norm -> activation."""
    out = conv2d(p["conv2d"], x, stride=stride, padding=padding)
    out = _apply_norm(p, out, norm, tracked_in=True)
    act = activation_fn(activation)
    return act(out) if act is not None else out


def upsample_conv_layer(p, x, *, padding=0, activation="relu", norm=None):
    """UpsampleConvLayer (submodules.py:69-97): 2x bilinear then conv."""
    n, h, w, _ = x.shape
    if _upfuse_applicable(p["conv2d"], x, padding):
        out = upsample_conv2x_fused(p["conv2d"], x)
    else:
        up = resize_bilinear(x, 2 * h, 2 * w)
        if _s2d_applicable(p["conv2d"], up, 1, padding):
            out = conv2d_s2d(p["conv2d"], up)
        else:
            out = conv2d(p["conv2d"], up, stride=1, padding=padding)
    out = _apply_norm(p, out, norm, tracked_in=True)
    act = activation_fn(activation)
    return act(out) if act is not None else out


def transposed_conv_layer(p, x, *, padding=0, activation="relu", norm=None):
    """TransposedConvLayer (submodules.py:38-66): stride-2 deconv."""
    out = conv_transpose2d(p["transposed_conv2d"], x, stride=2,
                           padding=padding, output_padding=1)
    out = _apply_norm(p, out, norm, tracked_in=True)
    act = activation_fn(activation)
    return act(out) if act is not None else out


def residual_block(p, x, *, norm=None):
    """ResidualBlock (submodules.py:152-184). Note: norm='IN' here uses
    untracked InstanceNorm (instance statistics at eval)."""
    residual = x
    out = conv2d(p["conv1"], x, stride=1, padding=1)
    if norm == "BN":
        out = batch_norm(p["bn1"], out)
    elif norm == "IN":
        out = instance_norm(out)
    out = jax.nn.relu(out)
    out = conv2d(p["conv2"], out, stride=1, padding=1)
    if norm == "BN":
        out = batch_norm(p["bn2"], out)
    elif norm == "IN":
        out = instance_norm(out)
    # the reference class accepts stride/downsample, but no call site in
    # the reference ever passes either (model.py:160, legacy.py:70,
    # spade_e2v.py:125, submodules.py:301, unet.py:52 — all defaults); a
    # half-supported branch here would silently diverge from the cited
    # semantics, so an unexpected subtree fails loudly instead
    if "downsample" in p:
        raise NotImplementedError(
            "ResidualBlock.downsample: no reference configuration "
            "constructs one (submodules.py:152-184 call sites)")
    out = out + residual
    return jax.nn.relu(out)
