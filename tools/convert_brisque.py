#!/usr/bin/env python
"""Convert pyiqa's BRISQUE SVR model to the npz layout evreal_tpu expects.

Run where pyiqa is installed (it downloads brisque_svm_weights.pth):

    python tools/convert_brisque.py weights/brisque_svm.npz

Keys produced: sv (n_sv, 36), sv_coef (n_sv,), gamma (), rho (),
scale_min (36,), scale_max (36,).
"""

import sys

import numpy as np


def main(out_path):
    import torch
    from pyiqa.archs.brisque_arch import BRISQUE  # noqa: F401
    from pyiqa.utils.download_util import load_file_from_url
    from pyiqa.archs import brisque_arch

    path = load_file_from_url(brisque_arch.default_model_urls["url"])
    d = torch.load(path, map_location="cpu", weights_only=False)
    out = {
        "sv": np.asarray(d["sv"], np.float64),
        "sv_coef": np.asarray(d["sv_coef"], np.float64).ravel(),
        "gamma": np.float64(d["gamma"]),
        "rho": np.float64(d["rho"]),
        "scale_min": np.asarray(d["scale_min"], np.float64),
        "scale_max": np.asarray(d["scale_max"], np.float64),
    }
    np.savez(out_path, **out)
    print(f"wrote {out_path}: sv {out['sv'].shape}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "weights/brisque_svm.npz")
