"""SPADE-E2VID (reference model/spade_e2v.py, class Unet6).

Quirks reproduced faithfully:
  * all BatchNorms run in eval mode on running statistics (spade_e2v.py:12,51);
  * on the very first frame, ``x_org = x[:, :3]`` is a *view* and the in-place
    min/max normalization mutates the first three voxel channels before the
    head conv runs (spade_e2v.py:147-153) — we replicate by rebuilding the
    input;
  * SPADE conditions on the previous 3-channel reconstruction via nearest
    resize (spade_e2v.py:63-76);
  * PixelShuffle upsampling (ICNR init only matters at train time);
  * output is the channel mean of a 3-channel sigmoid(BN(conv)) image.

State: 4 ConvLSTM states (rec0..rec2, up2), prev_recs (N,H,W,3), and an
``initialized`` flag selecting the x_org source.
"""

import jax
import jax.numpy as jnp

from evreal_tpu.nn.cells import conv_lstm, conv_lstm_zero_state
from evreal_tpu.nn.layers import (
    batch_norm,
    conv2d,
    fused_pair_conv,
    pixel_shuffle,
    resize_nearest,
)


def _rec_conv(p, x, state, stride):
    """spade_e2v.RecurrentConvLayer: conv(bias=False,k5,p2) -> BN -> relu -> ConvLSTM."""
    x = conv2d(p["conv0"], x, stride=stride, padding=2)
    x = jax.nn.relu(batch_norm(p["bn"], x))
    hidden, st = conv_lstm(p["recurrent_block"], x, state)
    return hidden, st


def _res_block(p, x):
    """spade_e2v.ResidualBlock: conv-BN-relu-conv-BN + skip, relu."""
    out = jax.nn.relu(batch_norm(p["bn1"], conv2d(p["conv1"], x, padding=1)))
    out = batch_norm(p["bn2"], conv2d(p["conv2"], out, padding=1))
    return jax.nn.relu(out + x)


def _spade(p, x, segmap):
    """SPADE (spade_e2v.py:45-76): BN(affine=False) modulated by segmap.

    The gamma and beta convs read the same shared activation, so they fuse
    into one conv at apply time (kernels concatenated along the output
    axis — channelwise-identical math, the same lever as the ConvGRU gate
    fusion in nn/cells.py; params stay keyed by the reference's separate
    module paths)."""
    normalized = batch_norm(p["param_free_norm"], x)
    seg = resize_nearest(segmap, x.shape[1], x.shape[2])
    actv = jax.nn.relu(conv2d(p["mlp_shared"]["0"], seg, padding=1))
    gamma, beta = fused_pair_conv(p["mlp_gamma"], p["mlp_beta"], actv,
                                  padding=1)
    return normalized * (1 + gamma) + beta


def _up_conv3(p, x, x_org, scale=2):
    """UpConvLayer3 (spade_e2v.py:79-110): conv -> PixelShuffle -> SPADE -> relu."""
    x = pixel_shuffle(conv2d(p["conv0"], x, padding=1), scale)
    return jax.nn.relu(_spade(p["norm"], x, x_org))


class SpadeE2vid:
    def __init__(self, **_):
        self.num_bins = 5
        self.num_encoders = 3  # forced by the harness (eval.py:132)

    def init_state(self, batch, h, w, dtype=jnp.float32):
        h2, w2 = (h + 1) // 2, (w + 1) // 2
        h4, w4 = (h2 + 1) // 2, (w2 + 1) // 2
        return {
            "rec0": conv_lstm_zero_state(batch, h, w, 64, dtype),
            "rec1": conv_lstm_zero_state(batch, h2, w2, 128, dtype),
            "rec2": conv_lstm_zero_state(batch, h4, w4, 256, dtype),
            "up2": conv_lstm_zero_state(batch, h, w, 32, dtype),
            "prev_recs": jnp.zeros((batch, h, w, 3), dtype),
            "initialized": jnp.zeros((), jnp.bool_),
        }

    def apply(self, params, state, voxel):
        p = params
        # First-frame x_org: min/max-normalized first 3 bins; this mutates the
        # head input too (reference in-place view semantics).
        # per-sample reduction (axis 0 is batch): the reference always runs
        # batch 1 (spade_e2v.py:147-153), and the batched/color paths rely
        # on batch equivariance — a whole-batch min/max would couple lanes
        first3 = voxel[..., :3]
        shifted = first3 - jnp.min(first3, axis=(1, 2, 3), keepdims=True)
        mx = jnp.max(shifted, axis=(1, 2, 3), keepdims=True)
        norm3 = jnp.where(mx > 0, shifted / jnp.where(mx > 0, mx, 1.0), shifted)

        init = state["initialized"]
        x_org = jnp.where(init, state["prev_recs"], norm3)
        head_in = jnp.where(
            init, voxel,
            jnp.concatenate([norm3, voxel[..., 3:]], axis=-1))

        head = jax.nn.relu(conv2d(p["fc"], head_in, padding=2))
        x0, s0 = _rec_conv(p["rec0"], head, state["rec0"], stride=1)
        x1, s1 = _rec_conv(p["rec1"], x0, state["rec1"], stride=2)
        x2, s2 = _rec_conv(p["rec2"], x1, state["rec2"], stride=2)
        x = _res_block(p["res0"], x2)
        x = _res_block(p["res1"], x)
        x = _up_conv3(p["up0"], x + x2, x_org)
        x = _up_conv3(p["up1"], x + x1, x_org)
        x, s3 = _rec_conv(p["up2"], x + x0, state["up2"], stride=1)
        img3 = jax.nn.sigmoid(
            batch_norm(p["bn_img"], conv2d(p["conv_img"], jax.nn.relu(x + head))))
        new_state = {"rec0": s0, "rec1": s1, "rec2": s2, "up2": s3,
                     "prev_recs": img3,
                     "initialized": jnp.ones((), jnp.bool_)}
        return {"image": jnp.mean(img3, axis=-1, keepdims=True)}, new_state
