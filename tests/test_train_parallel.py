"""Training step + mesh sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import optax
import pytest

from evreal_tpu.models import build_model
from evreal_tpu.models.init import init_e2vid, init_firenet
from evreal_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params
from evreal_tpu.train import make_train_step

CPU = jax.devices("cpu")


def _firenet_batch(n, t, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return {"voxels": rng.normal(size=(n, t, h, w, 5)).astype(np.float32),
            "frames": rng.uniform(size=(n, t, h, w)).astype(np.float32)}


def test_train_step_reduces_loss_single_device():
    model = build_model("FireNet", {"num_bins": 5, "base_num_channels": 8,
                                    "kernel_size": 3})
    params = jax.tree.map(np.asarray,
                          init_firenet(base_num_channels=8))
    step, opt = make_train_step(model, optax.adam(1e-3))
    opt_state = opt.init(params)
    batch = _firenet_batch(2, 3, 16, 16)
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


@pytest.mark.parametrize("n_devices", [8, 4])
def test_train_step_sharded_matches_meshless(n_devices):
    model = build_model("E2VIDRecurrent", dict(
        num_bins=5, base_num_channels=8, kernel_size=3, num_encoders=2,
        recurrent_block_type="convgru", num_residual_blocks=1,
        skip_type="sum", norm=None, use_upsample_conv=True,
        final_activation="none"))
    params = jax.tree.map(np.asarray, init_e2vid(
        num_bins=5, base_num_channels=8, kernel_size=3, num_encoders=2,
        num_residual_blocks=1, recurrent_block_type="convgru"))
    batch = _firenet_batch(4, 2, 16, 32, seed=1)

    step0, opt0 = make_train_step(model, optax.adam(1e-3), remat=False)
    p0, o0, loss0 = step0(params, opt0.init(params), batch)

    mesh = make_mesh(n_devices, axes=("dp", "sp", "tp"), devices=CPU)
    with mesh:
        sp = shard_params(mesh, params)
        step1, opt1 = make_train_step(model, optax.adam(1e-3), mesh=mesh,
                                      remat=False)
        bsharded = {
            "voxels": jax.device_put(batch["voxels"],
                                     batch_sharding(mesh, 5, 0, 3)),
            "frames": jax.device_put(batch["frames"],
                                     batch_sharding(mesh, 4, 0, 3)),
        }
        p1, o1, loss1 = step1(sp, opt1.init(sp), bsharded)
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-5)
    # parameters after one step agree too
    flat0 = jax.tree.leaves(p0)
    flat1 = jax.tree.leaves(p1)
    for a, b in zip(flat0, flat1):
        # cross-device reduction order perturbs gradients at float noise level
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_graft_entry_points():
    import __graft_entry__ as g

    fn, args = g.entry()
    out, state = jax.jit(fn)(*args)
    assert out.shape == (1, 184, 240, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_mesh_factorization():
    assert dict(make_mesh(8, ("dp", "sp", "tp"), CPU).shape) == {
        "dp": 2, "sp": 2, "tp": 2}
    assert dict(make_mesh(4, ("dp", "sp"), CPU).shape) == {"dp": 2, "sp": 2}
    assert dict(make_mesh(1, ("dp", "sp"), CPU).shape) == {"dp": 1, "sp": 1}
    # dp (the batch axis) never gets a smaller factor than the other axes
    assert dict(make_mesh(2, ("dp", "sp", "tp"), CPU).shape) == {
        "dp": 2, "sp": 1, "tp": 1}
    assert dict(make_mesh(4, ("dp", "sp", "tp"), CPU).shape) == {
        "dp": 2, "sp": 2, "tp": 1}


def test_perceptual_loss_trains():
    """mse+lpips: differentiable through the LPIPS port, loss decreases."""
    import pytest

    from evreal_tpu.train import sequence_loss

    from .test_lpips_parity import _random_weights

    model = build_model("FireNet", {"num_bins": 5, "base_num_channels": 8,
                                    "kernel_size": 3})
    params = jax.tree.map(np.asarray, init_firenet(base_num_channels=8))
    w = {k: (v.transpose(2, 3, 1, 0) if v.ndim == 4 else v)
         for k, v in _random_weights(np.random.default_rng(3)).items()}
    step, opt = make_train_step(model, optax.adam(1e-3), loss="mse+lpips",
                                lpips_weights=w, lpips_scale=0.5)
    opt_state = opt.init(params)
    batch = _firenet_batch(1, 2, 48, 64, seed=2)
    losses = []
    for _ in range(4):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # pure-lpips differs from pure-mse on the same params
    a = sequence_loss(model, params, batch["voxels"], batch["frames"],
                      remat=False, loss="lpips", lpips_weights=w)
    b = sequence_loss(model, params, batch["voxels"], batch["frames"],
                      remat=False, loss="mse")
    assert float(a) != pytest.approx(float(b))

    with pytest.raises(ValueError, match="lpips_weights"):
        sequence_loss(model, params, batch["voxels"], batch["frames"],
                      loss="lpips")
    with pytest.raises(ValueError, match="terms"):
        sequence_loss(model, params, batch["voxels"], batch["frames"],
                      loss="mse+ssim")


def test_kaiming_uniform_matches_torch_default():
    """Conv init must match torch's Conv2d default (kaiming_uniform_ with
    a=sqrt(5)): bound = 1/sqrt(fan_in). A previous version was sqrt(2)
    larger, doubling initial weight variance."""
    from evreal_tpu.models.init import _kaiming_uniform

    rng = np.random.default_rng(0)
    w = _kaiming_uniform(rng, (3, 3, 16, 32))
    bound = 1.0 / np.sqrt(3 * 3 * 16)
    assert np.abs(w).max() <= bound * (1 + 1e-6)
    assert np.abs(w).max() > bound * 0.98  # uniform actually fills the range

    import torch

    conv = torch.nn.Conv2d(16, 32, 3)
    tb = conv.weight.detach().abs().max().item()
    assert abs(tb - np.abs(w).max()) < 0.05 * bound + abs(tb - bound)


def test_build_optimizer_variants():
    """Optimizer stack: schedules, warmup, weight decay, gradient clip."""
    import jax
    import jax.numpy as jnp

    from evreal_tpu.train import build_optimizer

    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.full((4,), 100.0)}  # large grads to exercise the clip

    for kw in ({"schedule": "cosine", "steps": 10, "warmup": 2},
               {"warmup": 3},
               {"weight_decay": 1e-2},
               {"clip_grad": 1.0}):
        opt = build_optimizer(lr=1e-2, **kw)
        state = opt.init(params)
        updates, state = opt.update(grads, state, params)
        new = jax.tree.map(lambda p, u: p + u, params, updates)
        assert np.isfinite(np.asarray(new["w"])).all()

    # clipped update magnitude is bounded by lr (adam) regardless of grads
    opt = build_optimizer(lr=1e-2, clip_grad=1.0)
    state = opt.init(params)
    updates, _ = opt.update(grads, state, params)
    assert np.abs(np.asarray(updates["w"])).max() <= 1e-2 * 1.01

    import pytest
    with pytest.raises(ValueError, match="cosine schedule needs"):
        build_optimizer(schedule="cosine")
    with pytest.raises(ValueError, match="unknown schedule"):
        build_optimizer(schedule="linear")


@pytest.mark.parametrize("loss_kind", ["mse", "mse+lpips"])
def test_sequence_loss_masks_padded_tail(loss_kind):
    """Zero-padded tail windows (short sequences) must not be scored
    against black frames — through both the MSE and LPIPS terms."""
    import jax.numpy as jnp

    from evreal_tpu.train import sequence_loss

    from .test_lpips_parity import _random_weights

    lw = None
    if "lpips" in loss_kind:
        lw = {k: (v.transpose(2, 3, 1, 0) if v.ndim == 4 else v)
              for k, v in _random_weights(np.random.default_rng(3)).items()}

    model = build_model("FireNet", {"num_bins": 5, "base_num_channels": 8,
                                    "kernel_size": 3})
    params = init_firenet(base_num_channels=8)
    rng = np.random.default_rng(0)
    vox = np.zeros((1, 4, 48, 64, 5), np.float32)
    frames = np.zeros((1, 4, 48, 64), np.float32)
    vox[:, :2] = rng.normal(0, 1, (1, 2, 48, 64, 5))
    frames[:, :2] = rng.uniform(0, 1, (1, 2, 48, 64))
    mask = np.array([[1, 1, 0, 0]], np.float32)

    kw = dict(remat=False, loss=loss_kind, lpips_weights=lw)
    masked = float(sequence_loss(model, params, jnp.asarray(vox),
                                 jnp.asarray(frames),
                                 mask=jnp.asarray(mask), **kw))
    # ground truth: loss over only the two real windows
    short = float(sequence_loss(model, params, jnp.asarray(vox[:, :2]),
                                jnp.asarray(frames[:, :2]), **kw))
    assert masked == pytest.approx(short, rel=1e-5)
    # unmasked loss differs (it scores the black tail)
    full = float(sequence_loss(model, params, jnp.asarray(vox),
                               jnp.asarray(frames), **kw))
    assert full != pytest.approx(short, rel=1e-4)


def test_bce_gradient_survives_sigmoid_saturation():
    """The bce loss term exists because MSE's gradient carries a sigma'
    factor that vanishes at the sigmoid rails — measured on chip: an
    ECD-scale E2VID MSE run collapsed to all-black within 20 steps and
    stayed pinned at mean(GT^2) (train.sequence_loss docstring). With the
    pred bias forced to -20 (outputs ~2e-9 everywhere), the MSE gradient
    through that bias must be ~dead while the BCE gradient stays at the
    healthy (p - y) scale."""
    import jax.numpy as jnp

    from evreal_tpu.train import sequence_loss

    model = build_model("E2VIDRecurrent", dict(
        num_bins=5, base_num_channels=8, kernel_size=3, num_encoders=1,
        num_residual_blocks=1, skip_type="sum", norm=None,
        use_upsample_conv=True, recurrent_block_type="convlstm",
        final_activation="sigmoid"))
    params = init_e2vid(base_num_channels=8, kernel_size=3, num_encoders=1,
                        num_residual_blocks=1)
    params["unetrecurrent"]["pred"]["conv2d"]["bias"] = (
        params["unetrecurrent"]["pred"]["conv2d"]["bias"] - 20.0)
    rng = np.random.default_rng(0)
    vox = jnp.asarray(rng.normal(size=(1, 2, 16, 16, 5)), jnp.float32)
    frames = jnp.asarray(rng.uniform(0.05, 0.3, (1, 2, 16, 16)),
                         jnp.float32)

    def bias_grad(kind):
        g = jax.grad(lambda p: sequence_loss(model, p, vox, frames,
                                             remat=False, loss=kind))(params)
        return float(np.abs(np.asarray(
            g["unetrecurrent"]["pred"]["conv2d"]["bias"])).max())

    g_mse, g_bce = bias_grad("mse"), bias_grad("bce")
    # sigma(-20) ~ 2e-9: the MSE chain carries it twice (error * sigma')
    assert g_mse < 1e-7, g_mse
    # BCE's logit-gradient is (p - y): mean target magnitude, no sigma'
    assert g_bce > 0.05, g_bce


def test_sample_batch_emits_gt_mask(tmp_path):
    """sample_batch must mark only windows with a GT frame as valid."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from make_synthetic_sequence import make_sequence

    from evreal_tpu.data import Sequence
    from evreal_tpu.ops.pad import CropParams
    from evreal_tpu.train_cli import sample_batch

    d = tmp_path / "seq0"
    make_sequence(str(d), height=32, width=48, duration_s=0.5, fps=20,
                  events_per_frame=400, seed=3)
    seq = Sequence(str(d), num_bins=5,
                   voxel_method={"method": "between_frames"})
    crop = CropParams(48, 32, 0)

    def voxelize(buffers):
        t = buffers["count"].shape[0]
        return np.zeros((t, 32, 48, 5), np.float32)

    # chunk_t longer than the sequence forces a zero-padded tail
    chunk_t = len(seq) + 4
    batch = sample_batch([seq], voxelize, np.random.default_rng(0), 2,
                         chunk_t, 5, crop)
    assert "mask" in batch and batch["mask"].shape == (2, chunk_t)
    assert batch["mask"].sum() > 0
    assert (batch["mask"][:, -4:] == 0).all()  # padded tail is invalid
    # every valid window carries a (possibly nonzero) GT frame slot
    assert ((batch["frames"].reshape(2, chunk_t, -1).max(-1) > 0)
            <= (batch["mask"] > 0)).all()
