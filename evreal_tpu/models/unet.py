"""E2VID family: recurrent UNet (reference model/unet.py + model/model.py).

Covers E2VID, E2VID+, SSL-E2VID (plain decoders) and HyperE2VID
(``use_dynamic_decoder=True``: first decoder is a DynamicUpsampleLayer fed by
the event tensor and the previous reconstruction, unet.py:60-64, 129-134).

The reference carries state implicitly on the module (``self.states``,
``self.prev_recs``); here the state pytree is
``{"cells": [...], "prev_recs": (N,H,W,1)}`` threaded explicitly.
"""

import jax
import jax.numpy as jnp

from evreal_tpu.models.hyper import dynamic_upsample_layer
from evreal_tpu.nn.cells import (
    conv_gru_zero_state,
    conv_lstm_zero_state,
    recurrent_conv_layer,
)
from evreal_tpu.nn.layers import (
    activation_fn,
    conv_layer,
    residual_block,
    transposed_conv_layer,
    upsample_conv_layer,
)


def _skip(kind, x, y):
    if kind == "sum":
        return x + y
    if kind == "concat":
        return jnp.concatenate([x, y], axis=-1)
    raise ValueError(f"unknown skip type {kind}")


class UNetRecurrentCore:
    """Static config + functional forward for UNetRecurrent (unet.py:85-143)."""

    def __init__(self, base_num_channels, num_encoders, num_residual_blocks,
                 num_bins, skip_type="sum", norm=None, use_upsample_conv=True,
                 recurrent_block_type=None, kernel_size=5,
                 channel_multiplier=2, use_dynamic_decoder=False,
                 final_activation="none", num_output_channels=1,
                 **unexpected):
        if unexpected:
            # faithful to the reference (BaseUNet.__init__ raises TypeError
            # on unknown unet_kwargs): a typo'd key must not silently fall
            # back to a default architecture
            raise TypeError("UNetRecurrent: unexpected unet_kwargs "
                            f"{sorted(unexpected)}")
        self.base = int(base_num_channels)
        self.num_encoders = int(num_encoders)
        self.num_residual_blocks = int(num_residual_blocks)
        self.num_bins = int(num_bins)
        self.skip_type = skip_type
        self.norm = None if norm in (None, "none") else str(norm)
        self.use_upsample_conv = bool(use_upsample_conv)
        self.cell = recurrent_block_type or "convlstm"
        self.kernel_size = int(kernel_size)
        self.channel_multiplier = channel_multiplier
        self.use_dynamic_decoder = bool(use_dynamic_decoder)
        self.final_activation = final_activation
        self.num_output_channels = int(num_output_channels)
        self.encoder_output_sizes = [
            int(self.base * channel_multiplier ** (i + 1))
            for i in range(self.num_encoders)
        ]

    def init_cell_states(self, batch, h, w, dtype=jnp.float32):
        zero = (conv_lstm_zero_state if self.cell == "convlstm"
                else conv_gru_zero_state)
        states = []
        hh, ww = h, w
        for size in self.encoder_output_sizes:
            hh, ww = (hh + 1) // 2, (ww + 1) // 2
            states.append(zero(batch, hh, ww, size, dtype))
        return states

    def forward(self, p, cell_states, x, prev_recs):
        k = self.kernel_size
        pad = k // 2
        ev_tensor = x
        x = conv_layer(p["head"], x, stride=1, padding=pad,
                       activation="relu", norm=None)
        head = x

        blocks = []
        new_states = []
        for i in range(self.num_encoders):
            x, st = recurrent_conv_layer(
                p["encoders"][str(i)], x, cell_states[i],
                stride=2, padding=pad, recurrent_block_type=self.cell,
                activation="relu", norm=self.norm)
            blocks.append(x)
            new_states.append(st)

        for i in range(self.num_residual_blocks):
            x = residual_block(p["resblocks"][str(i)], x, norm=self.norm)

        for i in range(self.num_encoders):
            dec = p["decoders"][str(i)]
            inp = _skip(self.skip_type, x, blocks[self.num_encoders - i - 1])
            if i == 0 and self.use_dynamic_decoder:
                x = dynamic_upsample_layer(dec, inp, ev_tensor, prev_recs,
                                           kernel_size=k, padding=pad)
            elif self.use_upsample_conv:
                x = upsample_conv_layer(dec, inp, padding=pad, norm=self.norm)
            else:
                x = transposed_conv_layer(dec, inp, padding=pad,
                                          norm=self.norm)

        img = conv_layer(p["pred"], _skip(self.skip_type, x, head),
                         padding=0, activation=None, norm=self.norm)
        act = activation_fn(self.final_activation)  # maps ''/'none' to None
        if act is not None:
            img = act(img)
        return img, new_states


class E2VIDRecurrent:
    """Reference model/model.py:108-144 wrapper (carries prev_recs)."""

    PARAM_ROOT = "unetrecurrent"

    def __init__(self, unet_kwargs=None, **kwargs):
        if unet_kwargs:
            # merge, explicit kwargs winning: a caller tweaking one field
            # on top of a stored config must not have the override
            # silently discarded
            kwargs = {**dict(unet_kwargs), **kwargs}
        self.core = UNetRecurrentCore(**kwargs)
        self.num_bins = self.core.num_bins
        self.num_encoders = self.core.num_encoders

    def init_state(self, batch, h, w, dtype=jnp.float32):
        # prev_recs carries what apply() stores: the 3-channel config
        # splits image/flow (image stays 1-channel); any other
        # num_output_channels threads through whole — the zero-state shape
        # must match or the harness scan rejects the carry on chunk 1
        img_ch = (1 if self.core.num_output_channels == 3
                  else self.core.num_output_channels)
        return {
            "cells": self.core.init_cell_states(batch, h, w, dtype),
            "prev_recs": jnp.zeros((batch, h, w, img_ch), dtype),
        }

    def apply(self, params, state, voxel):
        img, cells = self.core.forward(params[self.PARAM_ROOT],
                                       state["cells"], voxel,
                                       state["prev_recs"])
        out = {"image": img}
        if self.core.num_output_channels == 3:
            out = {"image": img[..., 0:1], "flow": img[..., 1:3]}
        new_state = {"cells": cells,
                     "prev_recs": jax.lax.stop_gradient(out["image"])}
        return out, new_state


class FlowNet(E2VIDRecurrent):
    """Reference model/model.py:14-43 (exported but unused by eval)."""

    PARAM_ROOT = "unetflow"
