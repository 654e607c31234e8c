#!/usr/bin/env python
"""Convert pyiqa's pretrained MANIQA weights for evreal_tpu and verify the
native port against pyiqa numerically. Run wherever ``pyiqa`` (and its torch
stack) is installable — it needs to download the pretrained checkpoint, so
not in a zero-egress image:

    python tools/convert_maniqa.py [variant] [weights/maniqa.npz]

``variant`` is a pyiqa metric name (default ``maniqa``; also e.g.
``maniqa-kadid``/``maniqa-koniq``). The script saves the state dict under
its original torch names plus ``_meta_scale``/``_meta_window``, then runs
both pyiqa's net and this repo's JAX port (evreal_tpu/metrics/maniqa.py) on
the same deterministic 224x224 gray image — where a 224 crop is the identity,
so pyiqa's unseeded cropping cannot diverge — and asserts the scores agree.
A failed assertion means the port's architecture drifted from pyiqa's; the
mismatch report below it shows where.
"""

import os
import sys

import numpy as np

_SKIP = ("relative_position_index", "attn_mask", "vit.head.",
         "vit.norm.", "num_batches_tracked")


def main(variant="maniqa", out_path="weights/maniqa.npz"):
    import pyiqa
    import torch

    metric = pyiqa.create_metric(variant, device="cpu")
    net = metric.net.eval()
    arrs = {}
    for k, v in net.state_dict().items():
        if any(s in k for s in _SKIP):
            continue
        arrs[k] = v.detach().cpu().numpy()

    swin = net.swintransformer1
    arrs["_meta_scale"] = np.float64(getattr(swin, "scale", 0.8))
    try:
        window = int(swin.layers[0].blocks[0].window_size)
    except (AttributeError, TypeError, IndexError):
        window = 4
    arrs["_meta_window"] = np.int64(window)

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **arrs)
    print(f"wrote {out_path}: {len(arrs)} arrays")

    # parity self-check: 224x224 -> the crop is deterministic on both sides
    g = torch.Generator().manual_seed(0)
    gray = torch.rand(1, 1, 224, 224, generator=g)
    with torch.no_grad():
        ref = float(metric(gray.repeat(1, 3, 1, 1)))

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from evreal_tpu.metrics import maniqa as m

    params = m.load_params(out_path)
    scale = float(params.pop("_meta_scale"))
    window = int(params.pop("_meta_window"))
    ours = float(m.maniqa(params, gray[0, 0].numpy(), n_crops=1,
                          window_size=window, scale=scale))
    print(f"pyiqa={ref:.6f} native={ours:.6f} diff={abs(ref - ours):.2e}")
    assert abs(ref - ours) < 1e-3, (
        "native MANIQA diverges from pyiqa — architecture drift; compare "
        "evreal_tpu/metrics/maniqa.py against pyiqa/archs/maniqa_arch.py")


if __name__ == "__main__":
    main(*sys.argv[1:])
