"""Golden parity: our FireNet models vs the reference torch models, using the
REAL shipped checkpoints (pretrained/FireNet{,+}/model.pth) over multi-step
recurrent rollouts."""

import numpy as np
import pytest

from evreal_tpu.convert import load_method_checkpoint, nest
from evreal_tpu.models import build_from_meta

from .oracle import ref_module

FIRENET_CKPT = "/root/reference/pretrained/FireNet/model.pth"
FIRENETP_CKPT = "/root/reference/pretrained/FireNet+/model.pth"


def rollout_ours(model, params, voxels):
    import jax.numpy as jnp

    n, h, w, _ = voxels[0].shape
    state = model.init_state(n, h, w)
    outs = []
    for v in voxels:
        out, state = model.apply(params, state, jnp.asarray(v))
        outs.append(np.asarray(out["image"]))
    return outs


def rollout_ref(ref_model, voxels_nchw):
    import torch

    ref_model.eval()
    outs = []
    with torch.no_grad():
        for v in voxels_nchw:
            outs.append(ref_model(torch.tensor(v))["image"].numpy())
    return outs


def make_voxels(t, n, b, h, w, seed=0):
    rng = np.random.default_rng(seed)
    vox = rng.normal(size=(t, n, h, w, b)).astype(np.float32)
    vox[np.abs(vox) < 0.7] = 0.0  # sparse, event-like
    return vox


@pytest.mark.parametrize("steps", [3])
def test_firenet_plus_shipped_checkpoint(steps):
    import torch

    flat, meta = load_method_checkpoint("FireNet+", FIRENETP_CKPT)
    assert meta["class"] == "FireNet"
    model = build_from_meta(meta)
    params = nest(flat)

    ref_mod = ref_module("model.model")
    ref_model = ref_mod.FireNet(**{k: v for k, v in meta["kwargs"].items()})
    ckpt = torch.load(FIRENETP_CKPT, map_location="cpu", weights_only=False)
    ref_model.load_state_dict(ckpt["state_dict"])
    ref_model.reset_states()

    vox = make_voxels(steps, 1, model.num_bins, 32, 40, seed=1)
    ours = rollout_ours(model, params, vox)
    ref = rollout_ref(ref_model, [v.transpose(0, 3, 1, 2) for v in vox])
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(o.transpose(0, 3, 1, 2), r, atol=1e-4)


@pytest.mark.parametrize("steps", [3])
def test_firenet_legacy_shipped_checkpoint(steps):
    import torch

    flat, meta = load_method_checkpoint("FireNet", FIRENET_CKPT)
    assert meta["class"] == "FireNet_legacy"
    model = build_from_meta(meta)
    assert model.num_encoders == 4  # BaseE2VID default (legacy.py:128-130)
    params = nest(flat)

    legacy = ref_module("model.legacy")
    kwargs = dict(meta["kwargs"])
    ref_model = legacy.FireNet_legacy(kwargs)
    ckpt = torch.load(FIRENET_CKPT, map_location="cpu", weights_only=False)
    ref_model.load_state_dict(ckpt["state_dict"])
    ref_model.reset_states()

    vox = make_voxels(steps, 1, model.num_bins, 32, 40, seed=2)
    ours = rollout_ours(model, params, vox)
    ref = rollout_ref(ref_model, [v.transpose(0, 3, 1, 2) for v in vox])
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(o.transpose(0, 3, 1, 2), r, atol=1e-4)


def test_legacy_kernel_size_default_is_5():
    """The reference wrapper defaults kernel_size to 5 when the checkpoint
    config omits it (legacy.py:152); a 3 here would desync padding from a
    5x5-weight checkpoint."""
    from evreal_tpu.models.firenet import FireNetLegacy

    assert FireNetLegacy().kernel_size == 5


def test_firenet_legacy_recurrent_blocks_variant():
    """recurrent_blocks={'resblock': [0, 1]}: both resblocks recurrent
    (legacy.py:59, 100) — exercises the mixed recurrent/plain resblock list
    beyond the shipped checkpoint's default {'resblock': [0]}."""
    import torch

    from evreal_tpu.convert import convert_state_dict
    from evreal_tpu.models import build_model

    torch.manual_seed(9)
    legacy = ref_module("model.legacy")
    cfg = {"num_bins": 5, "base_num_channels": 12, "kernel_size": 3,
           "num_residual_blocks": 2,
           "recurrent_blocks": {"resblock": [0, 1]},
           "recurrent_block_type": "convgru"}
    ref_model = legacy.FireNet_legacy(dict(cfg))
    ref_model.eval()
    ref_model.reset_states()

    model = build_model("FireNet_legacy", dict(cfg))
    params = nest(convert_state_dict(ref_model.state_dict()))

    vox = make_voxels(3, 1, 5, 32, 40, seed=9)
    ours = rollout_ours(model, params, vox)
    ref = rollout_ref(ref_model, [v.transpose(0, 3, 1, 2) for v in vox])
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(o.transpose(0, 3, 1, 2), r, atol=1e-4)


def test_firenet_legacy_empty_recurrent_blocks():
    """recurrent_blocks={} means NO recurrent resblocks (reference
    config.get default only covers a missing key, legacy.py:167); a falsy-
    dict fallback would fabricate a recurrent resblock 0 and KeyError on a
    converted checkpoint."""
    import torch

    from evreal_tpu.convert import convert_state_dict
    from evreal_tpu.models import build_model

    torch.manual_seed(10)
    legacy = ref_module("model.legacy")
    cfg = {"num_bins": 5, "base_num_channels": 12, "kernel_size": 3,
           "num_residual_blocks": 2, "recurrent_blocks": {},
           "recurrent_block_type": "convgru"}
    ref_model = legacy.FireNet_legacy(dict(cfg))
    ref_model.eval()
    ref_model.reset_states()

    model = build_model("FireNet_legacy", dict(cfg))
    assert model.recurrent_indices == []
    params = nest(convert_state_dict(ref_model.state_dict()))

    vox = make_voxels(2, 1, 5, 32, 40, seed=10)
    ours = rollout_ours(model, params, vox)
    ref = rollout_ref(ref_model, [v.transpose(0, 3, 1, 2) for v in vox])
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(o.transpose(0, 3, 1, 2), r, atol=1e-4)
