"""Training support (a capability extension over the inference-only
reference): truncated-BPTT reconstruction training of event-video models.

``make_train_step`` builds a jitted step::

    (params, opt_state, batch) -> (params, opt_state, loss)

where ``batch = {"voxels": (N, T, H, W, B), "frames": (N, T, H, W)}``.
The model is scanned over T with its recurrent state as carry, gradients flow
through the whole chunk (with optional ``jax.checkpoint`` rematerialization to
trade FLOPs for HBM), and the loss is per-frame MSE, LPIPS (the perceptual
loss the E2VID line of work trains with; needs converted weights,
weights/README.md), or a weighted sum ``"mse+lpips"``.

Sharding: under a Mesh the step shards the batch over ``dp``, image width
over ``sp`` (GSPMD inserts conv halo exchanges), and wide conv kernels over
``tp`` via ``parallel.shard_params``; gradient reduction across ``dp`` is the
psum GSPMD derives from the sharded loss mean.
"""

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from evreal_tpu.parallel.mesh import batch_sharding


def sequence_loss(model, params, voxels, frames, remat=True, loss="mse",
                  lpips_weights=None, lpips_scale=1.0, mask=None):
    """Scanned-chunk loss. voxels: (N,T,H,W,B); frames: (N,T,H,W);
    mask: optional (N,T) per-window validity (1=real window) — zero-padded
    tail windows of short sequences must not be scored against black frames
    (their gradient pulls the model toward outputting black).

    ``loss``: '+'-joined terms from {mse, lpips, bce}. The LPIPS term runs
    the metric port (metrics/lpips.py — pure jnp convs, fully
    differentiable) on the raw model outputs (no clipping: it would zero
    gradients outside [0,1]; the trained architectures end in a sigmoid
    anyway). The BCE term (soft-target cross-entropy) is the stable choice
    for sigmoid-output models: its gradient w.r.t. the pre-sigmoid logit is
    (p - y) with NO sigma' factor, so it cannot rail-saturate — measured on
    chip (2026-08-20): pure-MSE E2VID training on a mostly-dark ECD-scale
    scene overshot into the dark sigmoid rail within 20 steps and pinned at
    the all-black loss floor mean(GT^2), with or without input norm, at lr
    1e-4 and 1e-3 (adam's second-moment memory plus the vanishing sigma'
    kept it trapped)."""
    n, t, h, w, _ = voxels.shape
    state = model.init_state(n, h, w, dtype=voxels.dtype)

    parts = loss.split("+")
    unknown = set(parts) - {"mse", "lpips", "bce"}
    if unknown or not parts:
        raise ValueError(f"loss={loss!r}: terms must be mse|lpips|bce")
    if "lpips" in parts and lpips_weights is None:
        raise ValueError("loss includes lpips but lpips_weights is None "
                         "(convert them with tools/convert_lpips.py)")

    apply_fn = model.apply
    if remat:
        apply_fn = jax.checkpoint(lambda p, s, v: model.apply(p, s, v))

    def step(st, v):
        out, st = apply_fn(params, st, v)
        return st, out["image"][..., 0]

    _, imgs = jax.lax.scan(step, state, jnp.moveaxis(voxels, 1, 0))
    imgs = jnp.moveaxis(imgs, 0, 1)  # (N, T, H, W)
    total = 0.0
    m = jnp.ones((n, t), voxels.dtype) if mask is None \
        else mask.astype(voxels.dtype)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    if "mse" in parts:
        per_frame = jnp.mean((imgs - frames) ** 2, axis=(2, 3))  # (N, T)
        total = total + jnp.sum(per_frame * m) / denom
    if "bce" in parts:
        # soft-target cross-entropy on the sigmoid output. The clip only
        # guards log(0)/log1p(-1); its bounds must sit at the very edge of
        # f32 — a loose floor (e.g. 1e-6) would zero the gradient for any
        # deeper-saturated pixel (clip passes no gradient outside its
        # range), silently recreating the MSE trap this term exists to
        # avoid (tests/test_train_parallel.py locks the -20-logit case).
        # f32 sigmoid itself rounds to exactly 0/1 beyond |z|~17-103;
        # nothing recovers a gradient through an exactly-flat function.
        p = jnp.clip(imgs.astype(jnp.float32), 1e-35, 1.0 - 1e-7)
        frames = frames.astype(jnp.float32)
        per_frame = -jnp.mean(frames * jnp.log(p)
                              + (1.0 - frames) * jnp.log1p(-p),
                              axis=(2, 3))  # (N, T)
        total = total + jnp.sum(per_frame * m) / denom
    if "lpips" in parts:
        from evreal_tpu.metrics.lpips import lpips as lpips_fn

        d = lpips_fn(lpips_weights, imgs.reshape(n * t, h, w),
                     frames.reshape(n * t, h, w))
        total = total + lpips_scale * jnp.sum(d * m.reshape(-1)) / denom
    return total


def build_optimizer(lr=1e-4, schedule="constant", steps=None, warmup=0,
                    weight_decay=0.0, clip_grad=0.0):
    """Production optimizer stack: optional global-norm gradient clipping,
    adam/adamw, and a constant or linear-warmup cosine-decay schedule
    (``steps`` required for cosine)."""
    if schedule == "cosine":
        if not steps:
            raise ValueError("cosine schedule needs total steps")
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup else lr, peak_value=lr,
            warmup_steps=warmup, decay_steps=steps)
    elif schedule == "constant":
        sched = lr
        if warmup:
            sched = optax.join_schedules(
                [optax.linear_schedule(0.0, lr, warmup),
                 optax.constant_schedule(lr)], [warmup])
    else:
        raise ValueError(f"unknown schedule {schedule!r}")
    core = (optax.adamw(sched, weight_decay=weight_decay) if weight_decay
            else optax.adam(sched))
    if clip_grad:
        return optax.chain(optax.clip_by_global_norm(clip_grad), core)
    return core


def make_train_step(model, optimizer=None, mesh=None, remat=True,
                    loss="mse", lpips_weights=None, lpips_scale=1.0):
    if optimizer is None:
        optimizer = optax.adam(1e-4)

    def train_step(params, opt_state, batch):
        from evreal_tpu.harness.runner import matmul_precision_ctx

        voxels, frames = batch["voxels"], batch["frames"]
        mask = batch.get("mask")
        if mesh is not None:
            voxels = jax.lax.with_sharding_constraint(
                voxels, batch_sharding(mesh, voxels.ndim, 0, 3))
            frames = jax.lax.with_sharding_constraint(
                frames, batch_sharding(mesh, frames.ndim, 0, 3))
        # pin matmul precision like every eval pipeline: the backend default
        # is a single bf16 pass on real TPU, which would train against a
        # forward function different from the one eval runs (measured drift
        # up to 7.5e-3 on FireNet reconstructions, runner docstring)
        with matmul_precision_ctx(voxels.dtype):
            loss_val, grads = jax.value_and_grad(
                lambda p: sequence_loss(
                    model, p, voxels, frames, remat, loss=loss,
                    lpips_weights=lpips_weights, lpips_scale=lpips_scale,
                    mask=mask))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_val

    # NOTE: no donate_argnums — buffer donation makes device->host transfers
    # of the program's outputs fail with INVALID_ARGUMENT on the axon TPU
    # backend (see CLAUDE.md), and train_cli fetches the loss every step.
    if mesh is None:
        return jax.jit(train_step), optimizer

    out_shardings = (None, None, NamedSharding(mesh, P()))
    return jax.jit(train_step, out_shardings=out_shardings), optimizer
