"""FireNet family.

  * ``FireNet`` — the refactored model (reference model/model.py:147-190):
    head conv -> [ConvGRU -> ResidualBlock] x2 -> 1x1 pred. Used by the
    FireNet+ method (num_encoders forced to 0, eval.py:154-155).
  * ``FireNetLegacy`` — ``UNetFire`` (reference model/legacy.py:32-187):
    recurrent head + mixed recurrent/plain resblocks, pred 1x1. Used by the
    FireNet method. ``final_activation`` is accepted but unused, exactly like
    the reference (BaseE2VID never reads it).

State pytrees: a dict of ConvGRU hidden tensors, zero-initialized.
"""

import jax.numpy as jnp

from evreal_tpu.nn.cells import (
    conv_gru,
    conv_gru_zero_state,
    conv_lstm_zero_state,
    recurrent_conv_layer,
    recurrent_residual_layer,
)
from evreal_tpu.nn.layers import conv_layer, residual_block


class FireNet:
    def __init__(self, num_bins=5, base_num_channels=16, kernel_size=3, **_):
        self.num_bins = num_bins
        self.base = base_num_channels
        self.kernel_size = kernel_size
        self.num_encoders = 0  # forced for FireNet+ (eval.py:154-155)

    def init_state(self, batch, h, w, dtype=jnp.float32):
        return {
            "G1": conv_gru_zero_state(batch, h, w, self.base, dtype),
            "G2": conv_gru_zero_state(batch, h, w, self.base, dtype),
        }

    def apply(self, params, state, voxel):
        pad = self.kernel_size // 2
        k = self.kernel_size
        x = conv_layer(params["head"], voxel, padding=pad, activation="relu")
        x, g1 = conv_gru(params["G1"], x, state["G1"], kernel_size=k)
        x = residual_block(params["R1"], x)
        x, g2 = conv_gru(params["G2"], x, state["G2"], kernel_size=k)
        x = residual_block(params["R2"], x)
        img = conv_layer(params["pred"], x, padding=0, activation=None)
        return {"image": img}, {"G1": g1, "G2": g2}


class FireNetLegacy:
    def __init__(self, num_bins=5, skip_type="sum", num_encoders=4,
                 base_num_channels=32, num_residual_blocks=2, norm=None,
                 kernel_size=5, recurrent_block_type="convgru",
                 recurrent_blocks=None, BN_momentum=0.1, **_):
        # kernel_size default 5 = the reference wrapper's
        # config.get('kernel_size', 5) (legacy.py:152); a checkpoint config
        # omitting it must build 5x5 convs
        self.num_bins = int(num_bins)
        self.num_encoders = int(num_encoders)  # BaseE2VID default 4; only
        # affects crop/pad, the net itself never resamples (legacy.py:128-130)
        self.base = int(base_num_channels)
        self.num_residual_blocks = int(num_residual_blocks)
        self.norm = None if norm in (None, "none") else str(norm)
        self.kernel_size = int(kernel_size)
        self.cell = str(recurrent_block_type)
        # explicit {} must mean "no recurrent resblocks" (the reference's
        # config.get default only applies to a *missing* key, legacy.py:167)
        if recurrent_blocks is None:
            recurrent_blocks = {"resblock": [0]}
        self.recurrent_indices = recurrent_blocks.get("resblock", [])

    def _is_recurrent(self, i):
        return i in self.recurrent_indices or -1 in self.recurrent_indices

    def init_state(self, batch, h, w, dtype=jnp.float32):
        zero = (conv_lstm_zero_state if self.cell == "convlstm"
                else conv_gru_zero_state)
        state = {"head": zero(batch, h, w, self.base, dtype)}
        for i in range(self.num_residual_blocks):
            if self._is_recurrent(i):
                state[f"resblock{i}"] = zero(batch, h, w, self.base, dtype)
        return state

    def apply(self, params, state, voxel):
        net = params["net"]
        k = self.kernel_size
        new_state = {}
        x, new_state["head"] = recurrent_conv_layer(
            net["head"], voxel, state["head"], stride=1,
            padding=k // 2, recurrent_block_type=self.cell, norm=self.norm)
        for i in range(self.num_residual_blocks):
            block = net["resblocks"][str(i)]
            if self._is_recurrent(i):
                x, new_state[f"resblock{i}"] = recurrent_residual_layer(
                    block, x, state[f"resblock{i}"],
                    recurrent_block_type=self.cell, norm=self.norm)
            else:
                x = residual_block(block, x, norm=self.norm)
        img = conv_layer(net["pred"], x, padding=0, activation=None)
        return {"image": img}, new_state
