"""Offline torch-checkpoint -> JAX-param-tree conversion.

Handles the reference's four checkpoint schemas (EVREAL eval.py:124-158):

  1. SPADE-E2VID: the checkpoint *is* the state_dict.
  2. SSL-E2VID: raw state_dict; architecture kwargs are hard-coded.
  3. E2VID: ``ckpt['model']`` holds unet kwargs; FireNet: ``ckpt['config']['model']``.
  4. E2VID+/FireNet+/ET-Net/HyperE2VID: ``ckpt['config']`` is a pickled
     ``parse_config.ConfigParser`` whose ``arch`` entry names class + kwargs.

Tensors are re-laid-out for JAX at conversion time:
  * conv weights OIHW -> HWIO
  * transposed-conv weights IOHW -> HWIO with spatial flip (so the forward is
    a plain input-dilated convolution)
  * 2-D weights (linear / packed qkv) (O, I) -> (I, O)
  * everything else kept; ``num_batches_tracked`` dropped

Output format: ``.npz`` of flat torch-style keys + a sidecar ``.json`` with
``{"model_name", "class", "kwargs"}``. Torch is only needed at conversion
time, never at eval time.
"""

import json
import os
import sys
import types

import numpy as np

# keys that are 2-D but are NOT linear weights (never transpose)
_KEEP_2D = ("bases",)
_TRANSPOSED_CONV_MARKERS = ("transposed_conv2d",)


def _install_parse_config_shim():
    """Checkpoint pickles reference ``parse_config.ConfigParser`` instances
    (reference parse_config.py:1-23); install a minimal stand-in."""
    if "parse_config" in sys.modules:
        return sys.modules["parse_config"]
    mod = types.ModuleType("parse_config")

    class ConfigParser:
        def __init__(self, *a, **k):
            self._config = {}

        def __setstate__(self, state):
            self.__dict__.update(state)

        def __getitem__(self, name):
            return self._config[name]

    # make the class picklable *as* parse_config.ConfigParser (tests create
    # reference-schema checkpoints with it)
    ConfigParser.__module__ = "parse_config"
    ConfigParser.__qualname__ = "ConfigParser"
    mod.ConfigParser = ConfigParser
    sys.modules["parse_config"] = mod
    return mod


def convert_tensor(key, t):
    a = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
    if key.endswith("num_batches_tracked"):
        return None
    if a.ndim == 4 and (key.endswith("weight")
                        or key.endswith("compositional_coefficients")):
        if any(m in key for m in _TRANSPOSED_CONV_MARKERS):
            # torch ConvTranspose2d weight (I, O, kh, kw): flip spatial and
            # lay out as HWIO so conv_transpose2d() is an ordinary conv.
            return np.ascontiguousarray(a[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))
        return np.ascontiguousarray(a.transpose(2, 3, 1, 0))
    if a.ndim == 2 and not any(key.endswith(k) for k in _KEEP_2D):
        return np.ascontiguousarray(a.T)
    return np.ascontiguousarray(a)


def convert_state_dict(state_dict):
    out = {}
    for k, v in state_dict.items():
        a = convert_tensor(k, v)
        if a is not None:
            out[k] = a
    return out


def nest(flat):
    """Flat {'a.b.c': x} -> nested {'a': {'b': {'c': x}}}."""
    tree = {}
    for key, val in flat.items():
        node = tree
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def _sidecar_path(path):
    """Meta sidecar next to the array file: '<file>.npz.json'. save_params
    may get a base path (np.savez appends '.npz') while load_params gets
    the '.npz' path — normalize so both agree on the same sidecar."""
    s = str(path)
    if not s.endswith(".npz"):
        s += ".npz"
    return s + ".json"


def save_params(path, flat, meta):
    """Atomic write: a conversion killed mid-np.savez (routine on this
    machine — wedged-backend processes get killed) would otherwise leave a
    truncated .npz that every later load_params hits as BadZipFile, with
    no caller able to tell it from a real checkpoint; temp + os.replace
    means the cache path only ever holds a complete file."""
    s = str(path)
    if not s.endswith(".npz"):
        s += ".npz"
    tmp = s + ".tmp.npz"  # np.savez appends .npz unless present
    np.savez(tmp, **flat)
    os.replace(tmp, s)
    side_tmp = _sidecar_path(s) + ".tmp"
    with open(side_tmp, "w", encoding="utf-8") as f:
        json.dump(meta, f, indent=1)
    os.replace(side_tmp, _sidecar_path(s))


def load_params(path):
    """Load a converted .npz into a nested jnp tree plus its meta dict."""
    import jax.numpy as jnp

    with np.load(path) as data:  # close the fd (long-lived processes)
        flat = {k: jnp.asarray(data[k]) for k in data.files}
    try:
        with open(_sidecar_path(path), encoding="utf-8") as f:
            meta = json.load(f)
    except FileNotFoundError:
        raise FileNotFoundError(
            f"missing meta sidecar {_sidecar_path(path)} for {path} — "
            f"the model class/kwargs cannot be recovered; re-run the "
            f"conversion (save_params writes both files)") from None
    return nest(flat), meta


def load_method_checkpoint(model_name, checkpoint_path):
    """Parse one of the four reference checkpoint schemas.

    Returns (flat_converted_params, meta) where meta carries the class name
    and constructor kwargs needed to build the JAX model.
    """
    import torch

    _install_parse_config_shim()
    ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)

    if model_name == "SPADE-E2VID":
        state_dict = ckpt
        meta = {"class": "SpadeE2vid", "kwargs": {}, "num_encoders": 3}
    elif model_name == "SSL-E2VID":
        state_dict = ckpt
        kwargs = {"base_num_channels": 32, "kernel_size": 5, "num_bins": 5,
                  "num_encoders": 3, "recurrent_block_type": "convlstm",
                  "num_residual_blocks": 2, "skip_type": "sum", "norm": None,
                  "use_upsample_conv": True}
        meta = {"class": "E2VIDRecurrent", "kwargs": kwargs}
    elif model_name == "E2VID":
        kwargs = dict(ckpt["model"])
        kwargs["final_activation"] = "sigmoid"
        state_dict = ckpt["state_dict"]
        meta = {"class": "E2VIDRecurrent", "kwargs": kwargs}
    elif model_name == "FireNet":
        kwargs = dict(ckpt["config"]["model"])
        kwargs["final_activation"] = ""
        state_dict = ckpt["state_dict"]
        meta = {"class": "FireNet_legacy", "kwargs": kwargs}
    else:
        cfg = ckpt["config"]
        arch = cfg["arch"]
        state_dict = ckpt["state_dict"]
        meta = {"class": arch["type"], "kwargs": dict(arch.get("args", {}))}
        if model_name == "ET-Net":
            meta["num_encoders"] = 3
        elif model_name == "FireNet+":
            meta["num_encoders"] = 0

    meta["model_name"] = model_name
    return convert_state_dict(state_dict), meta
