"""Model registry: reference class name -> JAX model class.

``build_model`` mirrors the reference's constructor conventions
(eval.py:124-158): classes named like the torch ones, kwargs possibly nested
under ``unet_kwargs`` for ConfigParser-style checkpoints.
"""

from evreal_tpu.models.firenet import FireNet, FireNetLegacy


def _registry():
    from evreal_tpu.models.unet import E2VIDRecurrent, FlowNet
    from evreal_tpu.models.spade import SpadeE2vid
    from evreal_tpu.models.etnet import EITR

    return {
        "FireNet": FireNet,
        "FireNet_legacy": FireNetLegacy,
        "E2VIDRecurrent": E2VIDRecurrent,
        "FlowNet": FlowNet,
        "SpadeE2vid": SpadeE2vid,
        "EITR": EITR,
    }


def build_model(class_name, kwargs=None, num_encoders=None):
    kwargs = dict(kwargs or {})
    if "unet_kwargs" in kwargs:
        kwargs = dict(kwargs["unet_kwargs"])
    if "eitr_kwargs" in kwargs:
        kwargs = dict(kwargs["eitr_kwargs"])
    cls = _registry()[class_name]
    model = cls(**kwargs)
    if num_encoders is not None:
        model.num_encoders = num_encoders
    return model


def build_from_meta(meta):
    """Build a model from a converted checkpoint's sidecar meta dict."""
    return build_model(meta["class"], meta.get("kwargs"),
                       meta.get("num_encoders"))


def flagship_e2vid_kwargs(num_bins=5):
    """The published E2VID architecture (reference eval.py:134-139 — the
    SSL-E2VID hard-coded kwargs, shared by the E2VID-family checkpoints):
    the single source for bench.py, tools/bench_methods.py,
    __graft_entry__.py and train_cli.py, which previously each carried a
    copy."""
    return dict(num_bins=num_bins, base_num_channels=32, kernel_size=5,
                num_encoders=3, recurrent_block_type="convlstm",
                num_residual_blocks=2, skip_type="sum", norm=None,
                use_upsample_conv=True, final_activation="sigmoid")


def build_flagship_e2vid(seed=0, num_bins=5):
    """(model, host-numpy params) for the flagship E2VID architecture."""
    import numpy as np

    from evreal_tpu.models.init import init_e2vid

    model = build_model("E2VIDRecurrent", flagship_e2vid_kwargs(num_bins))
    params = init_e2vid(seed=seed, num_bins=num_bins, base_num_channels=32,
                        kernel_size=5, num_encoders=3)
    import jax

    return model, jax.tree.map(np.asarray, params)
