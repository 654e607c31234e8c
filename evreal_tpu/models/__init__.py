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
