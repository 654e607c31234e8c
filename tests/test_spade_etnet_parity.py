"""Parity: SPADE-E2VID and ET-Net vs reference torch implementations
(random weights, multi-step rollouts, running BN stats randomized)."""

import numpy as np

from evreal_tpu.convert import convert_state_dict, nest
from evreal_tpu.models import build_model

from .oracle import ref_module
from .test_firenet_parity import make_voxels, rollout_ours, rollout_ref


def _randomize_running_stats(model, seed=0):
    """Shipped checkpoints carry trained BN stats; emulate with random ones."""
    import torch

    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if hasattr(m, "running_mean") and m.running_mean is not None:
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


def test_spade_e2vid_parity():
    import torch

    torch.manual_seed(3)
    spade_mod = ref_module("model.spade_e2v")
    ref_model = spade_mod.Unet6()
    _randomize_running_stats(ref_model, seed=4)
    ref_model.eval()
    ref_model.reset_states()

    params = nest(convert_state_dict(ref_model.state_dict()))
    model = build_model("SpadeE2vid")

    vox = make_voxels(3, 1, 5, 32, 40, seed=5)
    ours = rollout_ours(model, params, vox)
    ref = rollout_ref(ref_model, [v.transpose(0, 3, 1, 2).copy() for v in vox])
    for t, (o, r) in enumerate(zip(ours, ref)):
        np.testing.assert_allclose(o.transpose(0, 3, 1, 2), r, atol=2e-4,
                                   err_msg=f"step {t}")


def test_etnet_parity():
    import torch

    torch.manual_seed(6)
    eitr_mod = ref_module("model.eitr.eitr")
    ref_model = eitr_mod.EITR({"num_bins": 5, "norm": None})
    ref_model.eval()
    ref_model.reset_states()

    params = nest(convert_state_dict(ref_model.state_dict()))
    model = build_model("EITR", {"eitr_kwargs": {"num_bins": 5, "norm": None}})

    vox = make_voxels(2, 1, 5, 32, 40, seed=7)  # 32,40 divisible by 8
    ours = rollout_ours(model, params, vox)
    ref = rollout_ref(ref_model, [v.transpose(0, 3, 1, 2) for v in vox])
    for t, (o, r) in enumerate(zip(ours, ref)):
        np.testing.assert_allclose(o.transpose(0, 3, 1, 2), r, atol=2e-4,
                                   err_msg=f"step {t}")


def test_spade_batch_equivariance():
    """The batched/color paths stack independent streams on the batch axis;
    SPADE's first-frame min/max normalization must reduce per sample, not
    over the whole batch (the reference always runs batch 1)."""
    import torch

    torch.manual_seed(6)
    spade_mod = ref_module("model.spade_e2v")
    ref_model = spade_mod.Unet6()
    _randomize_running_stats(ref_model, seed=7)
    params = nest(convert_state_dict(ref_model.state_dict()))
    model = build_model("SpadeE2vid")

    rng = np.random.default_rng(8)
    # two streams with very different voxel ranges (scales the min/max)
    v0 = rng.normal(0, 1, (1, 32, 40, 5)).astype(np.float32)
    v1 = rng.normal(0, 10, (1, 32, 40, 5)).astype(np.float32)
    both = np.concatenate([v0, v1])

    def run(voxels, steps=2):
        st = model.init_state(voxels.shape[0], 32, 40)
        outs = []
        for _ in range(steps):
            out, st = model.apply(params, st, voxels)
            outs.append(np.asarray(out["image"]))
        return outs

    o_batch = run(both)
    o_sep0, o_sep1 = run(v0), run(v1)
    for t in range(2):
        np.testing.assert_allclose(o_batch[t][0], o_sep0[t][0], atol=1e-5)
        np.testing.assert_allclose(o_batch[t][1], o_sep1[t][0], atol=1e-5)


def test_etnet_split_execution_matches_apply():
    """The harness's split execution (scan encode_recurrent, then
    decode_batched on the whole chunk) must equal per-frame apply()."""
    import jax
    import jax.numpy as jnp
    import torch

    torch.manual_seed(11)
    eitr_ref = ref_module("model.eitr.eitr")
    ref_model = eitr_ref.EITR({"num_bins": 5, "norm": None})
    params = nest(convert_state_dict(ref_model.state_dict()))
    model = build_model("EITR", {"num_bins": 5})

    rng = np.random.default_rng(12)
    t, h, w = 4, 16, 24
    vox = jnp.asarray(rng.normal(0, 1, (t, h, w, 5)).astype(np.float32))

    st = model.init_state(1, h, w)
    per_frame = []
    for i in range(t):
        out, st = model.apply(params, st, vox[i][None])
        per_frame.append(np.asarray(out["image"][0]))

    def enc(st, v):
        feats, st = model.encode_recurrent(params, st, v[None])
        return st, tuple(f[0] for f in feats)

    st2, feats = jax.lax.scan(enc, model.init_state(1, h, w), vox)
    batched = np.asarray(model.decode_batched(params, feats)["image"])
    np.testing.assert_allclose(batched, np.stack(per_frame), atol=1e-5)
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_postln_transformer_parity():
    """The post-LN encoder-decoder variant (reference
    model/eitr/transformer.py — dead code there, ported for completeness):
    pos/task embeddings re-added at every layer, LN after each residual."""
    import torch

    import jax.numpy as jnp

    from evreal_tpu.nn.attention import transformer_postln

    torch.manual_seed(9)
    tf_mod = ref_module("model.eitr.transformer")
    ref_tf = tf_mod.transformer(d_model=32, nhead=4, num_encoder_layers=2,
                                num_decoder_layers=2, dim_feedforward=64,
                                dropout=0.0)
    ref_tf.eval()

    params = nest(convert_state_dict(ref_tf.state_dict()))
    rng = np.random.default_rng(0)
    L, N, E = 6, 2, 32
    src = rng.normal(size=(L, N, E)).astype(np.float32)
    pos = rng.normal(size=(L, N, E)).astype(np.float32)
    task = rng.normal(size=(L, N, E)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_tf(torch.tensor(src), torch.tensor(pos),
                         torch.tensor(task)).numpy()
    ours = np.asarray(transformer_postln(
        params, jnp.asarray(src.transpose(1, 0, 2)),
        jnp.asarray(pos.transpose(1, 0, 2)),
        jnp.asarray(task.transpose(1, 0, 2)), num_heads=4))
    np.testing.assert_allclose(ours.transpose(1, 0, 2), ref_out, atol=2e-5)

    # task_embed=None path (reference default)
    with torch.no_grad():
        ref_out2 = ref_tf(torch.tensor(src), torch.tensor(pos)).numpy()
    ours2 = np.asarray(transformer_postln(
        params, jnp.asarray(src.transpose(1, 0, 2)),
        jnp.asarray(pos.transpose(1, 0, 2)), num_heads=4))
    np.testing.assert_allclose(ours2.transpose(1, 0, 2), ref_out2,
                               atol=2e-5)
