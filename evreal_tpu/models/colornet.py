"""ColorNet (reference model/model.py:46-105): RGBW Bayer sub-sampling fed
through a recurrent model with per-channel state, merged on host.

TPU-native redesign: instead of the reference's 5 sequential forwards per
frame, the four half-resolution Bayer channels run as ONE batch-4 scan and
the full-res grayscale as a batch-1 scan — numerically identical (the model
is batch-equivariant), ~2.5x fewer dispatches and far better MXU utilization.
The uint8 LAB merge stays on host (cv2), matching the reference bit-for-bit.
"""

import jax
import jax.numpy as jnp
import numpy as np

from evreal_tpu.ops.pad import CropParams
from evreal_tpu.utils.color import merge_channels_into_color_image

# Bayer pattern slices on (H, W): reference model/model.py:54-58
CHANNEL_SLICES = {
    "R": (slice(0, None, 2), slice(0, None, 2)),
    "G": (slice(0, None, 2), slice(1, None, 2)),
    "B": (slice(1, None, 2), slice(1, None, 2)),
    "W": (slice(1, None, 2), slice(0, None, 2)),
}
COLOR_ORDER = ("R", "G", "B", "W")


class ColorRunner:
    """Chunked color evaluation for one (model, full sensor resolution).

    ``voxel_stage``: jittable event-buffer-dict -> (T, H, W, B) voxels
    (shared with the grayscale MethodRunner, includes event normalization)."""

    def __init__(self, model, params, height, width, voxel_stage,
                 chunk_t=None):
        import os

        self.model = model
        self.params = params
        self.h, self.w = height, width
        self.voxel_stage = voxel_stage
        # consumed by the harness loop (eval_method_on_sequence), which
        # packs and dispatches chunk_t windows per compiled call; the color
        # model runs 5 sub-passes per window, so the default is smaller
        # than the grayscale runner's 32. An explicit EVREAL_CHUNK_T
        # applies here too (it previously only reached the grayscale
        # runners, silently ignoring the knob for color runs).
        if chunk_t is None:
            chunk_t = int(os.environ.get("EVREAL_CHUNK_T", "16"))
        self.chunk_t = chunk_t
        enc = model.num_encoders
        self.crop_half = CropParams(width // 2, height // 2, enc)
        self.crop_full = CropParams(width, height, enc)
        self._fn = None

    def init_state(self):
        from evreal_tpu.harness import staging

        staging.note_compute()  # dispatches a device program
        ph2, pw2 = self.crop_half.padded_shape
        ph, pw = self.crop_full.padded_shape
        return {"color": self.model.init_state(4, ph2, pw2),
                "gray": self.model.init_state(1, ph, pw)}

    def _build(self):
        model = self.model
        crop_half, crop_full = self.crop_half, self.crop_full
        voxel_stage = self.voxel_stage

        def fn(params, state, bufs):
            from evreal_tpu.harness.runner import matmul_precision_ctx

            with matmul_precision_ctx():
                return inner(params, state, bufs)

        def inner(params, state, bufs):
            voxels = voxel_stage(bufs)  # (T, H, W, B)
            # even-crop before the Bayer slicing: at an odd sensor H or W
            # the 0::2 and 1::2 slices differ by one, and the batch-4
            # stack would fail at trace. Divergence note: the reference
            # pads each channel to its own size (model.py:81-90), keeping
            # the odd last row/col in the R/G passes; here the chroma
            # passes drop it (the full-res grayscale pass — which carries
            # the merged image's lightness — is unaffected).
            voxels_even = voxels[:, : crop_half.height * 2,
                                 : crop_half.width * 2, :]
            color_stack = jnp.stack(
                [voxels_even[:, CHANNEL_SLICES[c][0],
                             CHANNEL_SLICES[c][1], :]
                 for c in COLOR_ORDER], axis=1)  # (T, 4, H/2, W/2, B)
            color_stack = crop_half.pad(color_stack)
            gray = crop_full.pad(voxels)[:, None]  # (T, 1, ph, pw, B)

            def step_color(st, v):
                out, st = model.apply(params, st, v)
                return st, out["image"]

            cstate, cimgs = jax.lax.scan(step_color, state["color"],
                                         color_stack)
            gstate, gimgs = jax.lax.scan(step_color, state["gray"], gray)
            cimgs = crop_half.crop(cimgs)[..., 0]  # (T, 4, H/2, W/2)
            gimgs = crop_full.crop(gimgs)[:, 0, :, :, 0]  # (T, H, W)
            cimgs = jnp.clip(cimgs * 255, 0, 255).astype(jnp.uint8)
            gimgs = jnp.clip(gimgs * 255, 0, 255).astype(jnp.uint8)
            return {"color": cstate, "gray": gstate}, cimgs, gimgs

        return jax.jit(fn)  # no donation: axon transfer bug (see runner)

    def run(self, state, buffers):
        # one jitted fn; jax.jit caches per input-shape signature
        from evreal_tpu.harness import staging

        staging.note_compute()
        if self._fn is None:
            self._fn = self._build()
        return self._fn(self.params, state, dict(buffers))

    def merge_host(self, cimgs, gimgs):
        """Per-frame host merge -> float32 HWC BGR in [0,1] (reference
        to_tensor semantics)."""
        # one device->host transfer per tensor, not per frame*channel (the
        # harness already passes numpy; this covers direct device callers)
        cimgs = np.asarray(cimgs)
        gimgs = np.asarray(gimgs)
        out = []
        for t in range(cimgs.shape[0]):
            channels = {c: cimgs[t, i] for i, c in enumerate(COLOR_ORDER)}
            channels["grayscale"] = gimgs[t]
            bgr = merge_channels_into_color_image(channels)
            out.append(bgr.astype(np.float32) / 255.0)
        return out
