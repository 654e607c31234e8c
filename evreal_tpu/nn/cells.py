"""Recurrent convolutional cells with explicit state.

The reference caches state on the module (submodules.py:187-313); here state
is an explicit pytree threaded through ``lax.scan``. A fresh state is zeros,
matching the reference's zero-tensor initialization.
"""

import jax
import jax.numpy as jnp

from evreal_tpu.nn.layers import (conv2d, conv_layer,
                                  fused_pair_conv, residual_block)


def conv_lstm_zero_state(batch, h, w, hidden, dtype=jnp.float32):
    z = jnp.zeros((batch, h, w, hidden), dtype)
    return (z, z)


def conv_gru_zero_state(batch, h, w, hidden, dtype=jnp.float32):
    return jnp.zeros((batch, h, w, hidden), dtype)


def conv_lstm(p, x, state, *, kernel_size=3):
    """ConvLSTM (submodules.py:187-245): one gate conv -> 4 chunks in
    (input, remember, out, cell) order."""
    prev_hidden, prev_cell = state
    stacked = jnp.concatenate([x, prev_hidden], axis=-1)
    gates = conv2d(p["Gates"], stacked, padding=kernel_size // 2)
    i, f, o, g = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    o = jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    cell = f * prev_cell + i * g
    hidden = o * jnp.tanh(cell)
    return hidden, (hidden, cell)


def conv_gru(p, x, state, *, kernel_size=3):
    """ConvGRU (submodules.py:248-287).

    The update and reset gates read the same stacked input, so their two
    convs fuse into one at apply time: kernels concatenated along the
    output axis — channelwise-identical math (each output channel is an
    independent reduction), and the concat is loop-invariant so XLA hoists
    it out of the scan. 2 convs per step instead of the reference's 3 — a
    real lever in the op-dispatch-bound batch-1 regime (BASELINE.md
    roofline); params stay keyed by the reference's separate module paths.
    """
    prev = state
    pad = kernel_size // 2
    stacked = jnp.concatenate([x, prev], axis=-1)
    u_out, r_out = fused_pair_conv(p["update_gate"], p["reset_gate"],
                                   stacked, padding=pad)
    update, reset = jax.nn.sigmoid(u_out), jax.nn.sigmoid(r_out)
    out = jnp.tanh(conv2d(
        p["out_gate"], jnp.concatenate([x, prev * reset], axis=-1), padding=pad))
    new = prev * (1 - update) + out * update
    return new, new


def recurrent_conv_layer(p, x, state, *, stride=1, padding=0,
                         recurrent_block_type="convlstm", activation="relu",
                         norm=None):
    """RecurrentConvLayer (submodules.py:130-149): ConvLayer -> cell.

    The conv's kernel is implicit in the weight shape (its padding is the
    caller's ``padding``); the recurrent cell's gate kernel is always 3,
    hardcoded like the reference (submodules.py:143)."""
    x = conv_layer(p["conv"], x, stride=stride, padding=padding,
                   activation=activation, norm=norm)
    if recurrent_block_type == "convlstm":
        return conv_lstm(p["recurrent_block"], x, state)
    return conv_gru(p["recurrent_block"], x, state)


def recurrent_residual_layer(p, x, state, *, recurrent_block_type="convlstm",
                             norm=None):
    """RecurrentResidualLayer (submodules.py:290-313): ResidualBlock -> cell."""
    x = residual_block(p["conv"], x, norm=norm)
    if recurrent_block_type == "convlstm":
        return conv_lstm(p["recurrent_block"], x, state)
    return conv_gru(p["recurrent_block"], x, state)
