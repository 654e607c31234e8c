"""Multi-head attention and pre-LN transformer blocks for ET-Net.

Matches torch nn.MultiheadAttention (eval mode, no dropout) and the
reference's pre-norm encoder/decoder layers
(model/eitr/transformer_encoder.py:48-77, transformer_decoder.py:46-87).
Layout is batch-first (N, L, E); the reference uses (L, N, E) but the math is
identical.
"""

import jax
import jax.numpy as jnp
import numpy as np

from evreal_tpu.nn.layers import layer_norm, linear


def multihead_attention(p, q_in, k_in, v_in, num_heads):
    n, lq, e = q_in.shape
    lk = k_in.shape[1]
    d = e // num_heads
    wq, wk, wv = jnp.split(p["in_proj_weight"], 3, axis=1)
    bq, bk, bv = jnp.split(p["in_proj_bias"], 3)
    q = (q_in @ wq + bq).reshape(n, lq, num_heads, d)
    k = (k_in @ wk + bk).reshape(n, lk, num_heads, d)
    v = (v_in @ wv + bv).reshape(n, lk, num_heads, d)
    logits = jnp.einsum("nqhd,nkhd->nhqk", q, k) / np.sqrt(d).astype(q.dtype)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, lq, e)
    return linear(p["out_proj"], out)


def _ffn(p, x, activation=jax.nn.relu):
    return linear(p["linear2"], activation(linear(p["linear1"], x)))


def encoder_layer(p, src, num_heads):
    """Pre-LN: x + attn(LN(x)); x + ffn(LN(x))."""
    q = layer_norm(p["norm1"], src)
    src = src + multihead_attention(p["self_attn"], q, q, q, num_heads)
    src = src + _ffn(p, layer_norm(p["norm2"], src))
    return src


def decoder_layer(p, tgt, memory, num_heads):
    q = layer_norm(p["norm1"], tgt)
    tgt = tgt + multihead_attention(p["self_attn"], q, q, q, num_heads)
    q = layer_norm(p["norm21"], tgt)
    kv = layer_norm(p["norm22"], memory)
    tgt = tgt + multihead_attention(p["cross_attn"], q, kv, kv, num_heads)
    tgt = tgt + _ffn(p, layer_norm(p["norm3"], tgt))
    return tgt


def transformer_encoder(p, src, pos, num_heads=8):
    """Reference transformer_encoder: pos embedding added once before the
    first layer (transformer_encoder.py:36-45)."""
    out = src + pos
    layers = p["encoder"]["layers"]
    for i in range(len(layers)):
        out = encoder_layer(layers[str(i)], out, num_heads)
    return out


def transformer_decoder(p, tgt, memory, num_heads=8):
    out = tgt
    layers = p["decoder"]["layers"]
    for i in range(len(layers)):
        out = decoder_layer(layers[str(i)], out, memory, num_heads)
    return out


def sinusoid_table(n_position, d_hid):
    """Reference PositionalEncodingSine table (position_encoding.py:6-34)."""
    pos = np.arange(n_position)[:, None]
    j = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000.0, 2 * (j // 2) / d_hid)
    table = np.zeros((n_position, d_hid), np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return jnp.asarray(table, jnp.float32)
