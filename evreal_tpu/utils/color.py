"""Color reconstruction merge (reference utils/color_utils.py:5-88): upsample
the four half-res Bayer-channel reconstructions, align origins, build a BGR
image, then replace the LAB lightness with the full-res grayscale
reconstruction. All uint8 cv2 ops, bit-faithful to the reference."""

import cv2
import numpy as np


def shift_image(x, dx, dy):
    x = np.roll(x, dy, axis=0)
    x = np.roll(x, dx, axis=1)
    if dy > 0:
        x[:dy, :] = x[dy, :][None]
    elif dy < 0:
        x[dy:, :] = x[dy, :][None]
    if dx > 0:
        x[:, :dx] = x[:, dx][:, None]
    elif dx < 0:
        x[:, dx:] = x[:, dx][:, None]
    return x


def upsample_color_image(grayscale_highres, color_lowres_bgr):
    h, w = grayscale_highres.shape
    if color_lowres_bgr.shape[:2] != (h, w):
        # odd sensor H/W: the chroma image is 2x the floor'd half
        # resolution, one row/col short of the grayscale — stretch it to
        # the full extent (the reference's own merge, color_utils.py:31,
        # requires matching shapes and would fail here)
        color_lowres_bgr = cv2.resize(color_lowres_bgr, dsize=(w, h),
                                      interpolation=cv2.INTER_LINEAR)
    lab = cv2.cvtColor(src=color_lowres_bgr, code=cv2.COLOR_BGR2LAB)
    lab[:, :, 0] = grayscale_highres
    return cv2.cvtColor(src=lab, code=cv2.COLOR_LAB2BGR)


def merge_channels_into_color_image(channels):
    """channels: dict with uint8 'R','G','B','W' (half-res) and 'grayscale'
    (full-res). Returns full-res BGR uint8."""
    ch = dict(channels)
    for k in ("R", "G", "W", "B"):
        ch[k] = cv2.resize(ch[k], dsize=None, fx=2, fy=2,
                           interpolation=cv2.INTER_LINEAR)
    ch["B"] = shift_image(ch["B"], dx=1, dy=1)
    ch["G"] = shift_image(ch["G"], dx=1, dy=0)
    ch["W"] = shift_image(ch["W"], dx=0, dy=1)
    gw = cv2.addWeighted(src1=ch["G"], alpha=0.5, src2=ch["W"], beta=0.5,
                         gamma=0.0, dtype=cv2.CV_8U)
    bgr = np.dstack([ch["B"], gw, ch["R"]])
    return upsample_color_image(ch["grayscale"], bgr)
