"""Multi-head attention and transformer blocks for ET-Net.

Matches torch nn.MultiheadAttention (eval mode, no dropout) and the
reference's pre-norm encoder/decoder layers
(model/eitr/transformer_encoder.py:48-77, transformer_decoder.py:46-87),
plus the post-LN encoder-decoder variant (model/eitr/transformer.py, dead
code in the reference — ported for completeness).
Layout is batch-first (N, L, E); the reference uses (L, N, E) but the math is
identical.
"""

import jax
import jax.numpy as jnp
import numpy as np

from evreal_tpu.nn.layers import layer_norm, linear


def multihead_attention(p, q_in, k_in, v_in, num_heads):
    """Input projections fuse by argument identity (a trace-time Python
    property): self-attention (q_in is k_in is v_in) runs ONE packed
    matmul against the whole in_proj_weight; cross-attention with shared
    memory (k_in is v_in — every reference call site) packs k/v. Each
    output column is an independent reduction, so the fused form is
    channelwise-identical to torch's equally-packed in_proj — and 1-2
    dispatches instead of 3, a real lever for ET-Net's 21 attention
    blocks/frame in the op-dispatch-bound batch-1 regime."""
    n, lq, e = q_in.shape
    lk = k_in.shape[1]
    d = e // num_heads
    w, bias = p["in_proj_weight"], p["in_proj_bias"]
    if q_in is k_in and k_in is v_in:
        q, k, v = jnp.split((q_in @ w + bias).reshape(n, lq, 3, num_heads, d),
                            3, axis=2)
        q, k, v = q.squeeze(2), k.squeeze(2), v.squeeze(2)
    elif k_in is v_in:
        wq, wkv = jnp.split(w, [e], axis=1)
        bq, bkv = bias[:e], bias[e:]
        q = (q_in @ wq + bq).reshape(n, lq, num_heads, d)
        k, v = jnp.split((k_in @ wkv + bkv).reshape(n, lk, 2, num_heads, d),
                         2, axis=2)
        k, v = k.squeeze(2), v.squeeze(2)
    elif q_in is k_in:  # post-LN self-attn: q=k share the embed, v doesn't
        wqk, wv = jnp.split(w, [2 * e], axis=1)
        q, k = jnp.split(
            (q_in @ wqk + bias[:2 * e]).reshape(n, lq, 2, num_heads, d),
            2, axis=2)
        q, k = q.squeeze(2), k.squeeze(2)
        v = (v_in @ wv + bias[2 * e:]).reshape(n, lk, num_heads, d)
    else:
        wq, wk, wv = jnp.split(w, 3, axis=1)
        bq, bk, bv = jnp.split(bias, 3)
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


# ---------------------------------------------------------------------------
# Post-LN encoder-decoder variant (reference model/eitr/transformer.py —
# unreachable from every reference entry point, ported for completeness;
# PARITY.md). Differences vs the pre-LN path used by ET-Net: LayerNorm
# after each residual add instead of before each sublayer, and the
# pos/task embedding is re-added to q and k at EVERY layer (DETR-style
# with_embed, transformer.py:82-86) rather than once before layer 0.


def _with_embed(x, embed):
    return x if embed is None else x + embed


def encoder_layer_postln(p, src, pos, num_heads):
    """Reference TransformerEncoderLayer.forward (transformer.py:85-97)."""
    q = _with_embed(src, pos)
    src = layer_norm(p["norm1"],
                     src + multihead_attention(p["self_attn"], q, q, src,
                                               num_heads))
    return layer_norm(p["norm2"], src + _ffn(p, src))


def decoder_layer_postln(p, tgt, memory, task_embed, num_heads):
    """Reference TransformerDecoderLayer.forward (transformer.py:119-137)."""
    q = _with_embed(tgt, task_embed)
    tgt = layer_norm(p["norm1"],
                     tgt + multihead_attention(p["self_attn"], q, q, tgt,
                                               num_heads))
    q = _with_embed(tgt, task_embed)
    tgt = layer_norm(p["norm2"],
                     tgt + multihead_attention(p["cross_attn"], q, memory,
                                               memory, num_heads))
    return layer_norm(p["norm3"], tgt + _ffn(p, tgt))


def transformer_postln(p, src, pos, task_embed=None, num_heads=8):
    """Reference transformer.forward (transformer.py:30-34): encoder output
    feeds the decoder as both tgt and memory."""
    out = src
    enc = p["encoder"]["layers"]
    for i in range(len(enc)):
        out = encoder_layer_postln(enc[str(i)], out, pos, num_heads)
    tgt = memory = out
    dec = p["decoder"]["layers"]
    for i in range(len(dec)):
        tgt = decoder_layer_postln(dec[str(i)], tgt, memory, task_embed,
                                   num_heads)
    return tgt


def sinusoid_table(n_position, d_hid):
    """Reference PositionalEncodingSine table (position_encoding.py:6-34)."""
    pos = np.arange(n_position)[:, None]
    j = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000.0, 2 * (j // 2) / d_hid)
    table = np.zeros((n_position, d_hid), np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return jnp.asarray(table, jnp.float32)
