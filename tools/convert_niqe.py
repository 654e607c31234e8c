#!/usr/bin/env python
"""Convert the official NIQE pristine-model parameters
(``niqe_image_params.mat`` from the original release, also bundled with
pyiqa/skvideo) to the npz layout evreal_tpu expects:

    python tools/convert_niqe.py niqe_image_params.mat weights/niqe_params.npz

Keys produced: mu (36,), cov (36, 36).
"""

import sys

import numpy as np
from scipy.io import loadmat


def main(mat_path, out_path="weights/niqe_params.npz"):
    mat = loadmat(mat_path)
    mu = np.asarray(mat["pop_mu"]).reshape(-1)
    cov = np.asarray(mat["pop_cov"])
    assert mu.shape[0] == cov.shape[0] == cov.shape[1]
    np.savez(out_path, mu=mu, cov=cov)
    print(f"wrote {out_path}: mu {mu.shape}, cov {cov.shape}")


if __name__ == "__main__":
    main(*sys.argv[1:])
