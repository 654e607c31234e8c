#!/usr/bin/env python
"""Convert LPIPS(AlexNet) weights to the npz layout evreal_tpu expects.

Run in any environment where the torchvision AlexNet weights and the LPIPS
linear-head weights are obtainable (e.g. `pip install lpips torchvision`):

    python tools/convert_lpips.py weights/lpips_alex.npz

Keys produced:
  features.{0,3,6,8,10}.{weight,bias} — AlexNet convs, weight HWIO
  lin.{0..4}.weight                   — 1x1 LPIPS heads, weight HWIO
"""

import sys

import numpy as np


def main(out_path):
    import lpips as lpips_pkg  # noqa: F401 (pulls weights)
    import torch

    net = lpips_pkg.LPIPS(net="alex", verbose=False)
    out = {}
    alex = net.net.slice1  # slices hold the torchvision features modules
    feats = {}
    for slice_name in ("slice1", "slice2", "slice3", "slice4", "slice5"):
        for mod_idx, mod in getattr(net.net, slice_name)._modules.items():
            if isinstance(mod, torch.nn.Conv2d):
                feats[int(mod_idx)] = mod
    for idx, mod in feats.items():
        out[f"features.{idx}.weight"] = (
            mod.weight.detach().numpy().transpose(2, 3, 1, 0))
        out[f"features.{idx}.bias"] = mod.bias.detach().numpy()
    for i, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        out[f"lin.{i}.weight"] = w.transpose(2, 3, 1, 0)
    np.savez(out_path, **out)
    print(f"wrote {out_path} with {len(out)} arrays")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "weights/lpips_alex.npz")
