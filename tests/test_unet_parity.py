"""Parity: E2VIDRecurrent family vs the reference torch implementation with
randomly initialized weights, multi-step recurrent rollouts."""

import numpy as np
import pytest

from evreal_tpu.convert import convert_state_dict, nest
from evreal_tpu.models import build_model

from .oracle import ref_module
from .test_firenet_parity import make_voxels, rollout_ours, rollout_ref

E2VID_KW = {"num_bins": 5, "base_num_channels": 32, "kernel_size": 5,
            "num_encoders": 3, "recurrent_block_type": "convlstm",
            "num_residual_blocks": 2, "skip_type": "sum", "norm": None,
            "use_upsample_conv": True, "final_activation": "sigmoid"}

HYPER_KW = {"num_bins": 5, "base_num_channels": 32, "kernel_size": 5,
            "num_encoders": 3, "recurrent_block_type": "convgru",
            "num_residual_blocks": 2, "skip_type": "sum", "norm": None,
            "use_upsample_conv": True, "use_dynamic_decoder": True,
            "final_activation": "none"}

GRU_CONCAT_KW = {"num_bins": 5, "base_num_channels": 16, "kernel_size": 3,
                 "num_encoders": 2, "recurrent_block_type": "convgru",
                 "num_residual_blocks": 1, "skip_type": "concat",
                 "norm": None, "use_upsample_conv": True,
                 "final_activation": "none"}

DECONV_KW = {"num_bins": 5, "base_num_channels": 16, "kernel_size": 5,
             "num_encoders": 2, "recurrent_block_type": "convlstm",
             "num_residual_blocks": 1, "skip_type": "sum", "norm": None,
             "use_upsample_conv": False, "final_activation": "sigmoid"}


def _compare(kwargs, steps=3, hw=(32, 40), atol=1e-4, seed=0):
    import torch

    torch.manual_seed(seed)
    ref_mod = ref_module("model.model")
    # skip_concat is referenced by name in unet.py but never defined in the
    # reference's model_util; inject it for concat configs.
    mu = ref_module("model.model_util")
    if not hasattr(mu, "skip_concat"):
        mu.skip_concat = lambda x1, x2: torch.cat([x1, x2], dim=1)
        ref_module("model.unet").skip_concat = mu.skip_concat
    ref_model = ref_mod.E2VIDRecurrent(dict(kwargs))
    ref_model.eval()

    params = nest(convert_state_dict(ref_model.state_dict()))
    params = {"unetrecurrent": params["unetrecurrent"]}
    model = build_model("E2VIDRecurrent", dict(kwargs))

    h, w = hw
    vox = make_voxels(steps, 1, kwargs["num_bins"], h, w, seed=seed)
    ours = rollout_ours(model, params, vox)
    ref = rollout_ref(ref_model, [v.transpose(0, 3, 1, 2) for v in vox])
    for t, (o, r) in enumerate(zip(ours, ref)):
        np.testing.assert_allclose(o.transpose(0, 3, 1, 2), r, atol=atol,
                                   err_msg=f"step {t}")


def test_e2vid_convlstm_sum_sigmoid():
    _compare(E2VID_KW)


def test_hyper_dynamic_decoder():
    _compare(HYPER_KW, atol=2e-4)


def test_gru_concat_skip():
    _compare(GRU_CONCAT_KW)


def test_transposed_conv_decoder():
    _compare(DECONV_KW)


def test_fb_bases_match_reference():
    from evreal_tpu.models.hyper import bases_list

    fb_ref = ref_module("model.hyper.fourier_bessel")
    for ks, nb in [(3, 6), (5, 6)]:
        want = fb_ref.bases_list(ks, nb).numpy()
        got = bases_list(ks, nb)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_flownet_image_and_flow():
    """FlowNet (reference model/model.py:14-43): 3 output channels split
    into image + 2-channel flow (unet.py:140-141), params under
    'unetflow'."""
    import torch

    torch.manual_seed(4)
    ref_mod = ref_module("model.model")
    kw = dict(GRU_CONCAT_KW, num_output_channels=3, skip_type="sum")
    ref_model = ref_mod.FlowNet(dict(kw))
    ref_model.eval()
    ref_model.reset_states()

    params = nest(convert_state_dict(ref_model.state_dict()))
    model = build_model("FlowNet", dict(kw))

    h, w = 32, 40
    vox = make_voxels(3, 1, kw["num_bins"], h, w, seed=4)
    state = model.init_state(1, h, w)
    with torch.no_grad():
        for t, v in enumerate(vox):
            out, state = model.apply(params, state, v)
            ref_out = ref_model(torch.from_numpy(v.transpose(0, 3, 1, 2)))
            assert set(out) == {"image", "flow"} == set(ref_out)
            np.testing.assert_allclose(
                np.asarray(out["image"]).transpose(0, 3, 1, 2),
                ref_out["image"].numpy(), atol=1e-4, err_msg=f"img {t}")
            np.testing.assert_allclose(
                np.asarray(out["flow"]).transpose(0, 3, 1, 2),
                ref_out["flow"].numpy(), atol=1e-4, err_msg=f"flow {t}")


def test_batch_norm_variant():
    """norm='BN': eval-mode running-stats BatchNorm in every ConvLayer
    (submodules.py:19-23)."""
    kw = dict(GRU_CONCAT_KW, norm="BN", skip_type="sum")
    _compare(kw, seed=5)


def test_instance_norm_variant():
    """norm='IN': torch InstanceNorm2d (affine=False, no tracked stats by
    default) in every ConvLayer."""
    kw = dict(GRU_CONCAT_KW, norm="IN", skip_type="sum")
    _compare(kw, seed=6)
