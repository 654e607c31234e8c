#!/usr/bin/env python
"""Train an event-video reconstruction model from scratch (capability
extension — the reference is inference-only, README.md:8).

Truncated-BPTT over fixed-length window chunks with MSE reconstruction loss;
batches are (sequence, chunk) pairs sampled from the dataset; multi-device
meshes shard batch/dp, width/sp, wide kernels/tp.

    python train_cli.py --data data/SYN --arch firenet --steps 200 \
        --chunk-t 8 --batch 4 --out runs/firenet
"""

import argparse
import glob
import os

import numpy as np


def build(arch, num_bins):
    """(model, params, meta) — meta is the converted-checkpoint sidecar
    schema (convert/torch_ckpt.py), so a trained model.npz reloads through
    the eval CLI's load_method_params like any converted reference
    checkpoint."""
    from evreal_tpu.models import build_model
    from evreal_tpu.models.init import init_e2vid, init_firenet

    if arch == "firenet":
        kwargs = {"num_bins": num_bins, "base_num_channels": 16,
                  "kernel_size": 3}
        model = build_model("FireNet", kwargs)
        params = init_firenet(num_bins=num_bins)
        # the reference forces num_encoders 0 for this arch (eval.py:154-155)
        meta = {"class": "FireNet", "kwargs": kwargs, "num_encoders": 0}
    elif arch == "e2vid":
        from evreal_tpu.models import flagship_e2vid_kwargs

        kwargs = flagship_e2vid_kwargs(num_bins)
        model = build_model("E2VIDRecurrent", kwargs)
        params = init_e2vid(num_bins=num_bins)
        meta = {"class": "E2VIDRecurrent", "kwargs": kwargs}
    else:
        raise SystemExit(f"unknown arch {arch}")
    return model, params, meta


def sample_batch(seqs, voxelize, rng, batch, chunk_t, num_bins, crop):
    """Random (sequence, start) chunks -> {'voxels','frames'} arrays at the
    padded model resolution (GT frames zero-padded into the crop region)."""
    from evreal_tpu.data.packing import pack_windows

    ph, pw = crop.padded_shape
    pt, pl = crop.padding_top, crop.padding_left
    h, w = crop.height, crop.width
    voxels = np.zeros((batch, chunk_t, ph, pw, num_bins), np.float32)
    frames = np.zeros((batch, chunk_t, ph, pw), np.float32)
    mask = np.zeros((batch, chunk_t), np.float32)
    for b in range(batch):
        seq = seqs[rng.integers(len(seqs))]
        start = int(rng.integers(max(len(seq) - chunk_t, 1)))
        idxs = list(range(start, min(start + chunk_t, len(seq))))
        buffers, metas = pack_windows(seq, idxs)
        vox = voxelize(buffers)
        voxels[b, :len(idxs)] = np.asarray(vox)
        for t, meta in enumerate(metas):
            if meta["frame_index"] is not None:
                frames[b, t, pt:pt + h, pl:pl + w] = seq.frame(
                    meta["frame_index"])
                mask[b, t] = 1.0  # only real windows with a GT frame score
    return {"voxels": voxels, "frames": frames, "mask": mask}


def main(argv=None):
    import jax

    from evreal_tpu.data import Sequence
    from evreal_tpu.harness.runner import default_voxelize_impl, make_voxel_stage
    from evreal_tpu.ops.pad import CropParams
    from evreal_tpu.ops.voxelize import voxelize_matmul, voxelize_scatter
    from evreal_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params
    from evreal_tpu.train import make_train_step

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", required=True,
                    help="dataset root of memmap sequence dirs")
    ap.add_argument("--arch", default="firenet",
                    choices=["firenet", "e2vid"])
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--chunk-t", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--lr-schedule", default="constant",
                    choices=["constant", "cosine"])
    ap.add_argument("--warmup", type=int, default=0,
                    help="linear LR warmup steps")
    ap.add_argument("--weight-decay", type=float, default=0.0,
                    help="adamw decoupled weight decay (0 = plain adam)")
    ap.add_argument("--clip-grad", type=float, default=0.0,
                    help="global-norm gradient clip (0 = off)")
    ap.add_argument("--loss", default="mse",
                    help="'+'-joined terms from {mse, lpips, bce} (lpips "
                         "needs converted weights, weights/README.md; bce "
                         "is the saturation-stable choice for sigmoid-"
                         "output models — see train.sequence_loss)")
    ap.add_argument("--lpips-scale", type=float, default=1.0)
    ap.add_argument("--num-bins", type=int, default=5)
    ap.add_argument("--event-norm", action="store_true",
                    help="zero-mean/unit-std normalize each voxel's nonzero "
                         "entries (the E2VID/FireNet eval-time input norm). "
                         "Unnormalized event-count voxels scale with scene "
                         "activity and saturate a sigmoid-output model early "
                         "(measured: an ECD-scale E2VID run collapsed to "
                         "black, loss pinned at mean(GT^2), with raw "
                         "voxels); evaluate a checkpoint trained with this "
                         "flag with event_tensor_normalization: true")
    ap.add_argument("--mesh", action="store_true",
                    help="shard over all local devices (dp/sp/tp)")
    ap.add_argument("--out", default="runs/train")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--save-every", type=int, default=0,
                    help="checkpoint (params+opt_state+step) every N steps "
                         "via orbax; 0 disables")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint under --out")
    args = ap.parse_args(argv)

    seq_dirs = sorted(d for d in glob.glob(os.path.join(args.data, "*"))
                      if os.path.isdir(d))
    seqs = [Sequence(d, num_bins=args.num_bins,
                     voxel_method={"method": "between_frames"})
            for d in seq_dirs]
    assert seqs, f"no sequences under {args.data}"
    h, w = seqs[0].sensor_resolution
    crop = CropParams(w, h, 3)
    ph, pw = crop.padded_shape

    vox_impl = (voxelize_matmul if default_voxelize_impl() == "matmul"
                else voxelize_scatter)
    stage = jax.jit(make_voxel_stage(vox_impl, args.num_bins, (h, w),
                                     args.event_norm))

    def voxelize(buffers):
        v = stage(dict(buffers))
        return crop.pad(v)

    model, params, ckpt_meta = build(args.arch, args.num_bins)
    mesh = None
    if args.mesh and len(jax.devices()) > 1:
        mesh = make_mesh(len(jax.devices()), axes=("dp", "sp", "tp"))
        params = shard_params(mesh, params)
    lpips_weights = None
    if "lpips" in args.loss.split("+"):
        from evreal_tpu.metrics import lpips as lpips_mod

        if not lpips_mod.weights_available():
            raise SystemExit("--loss includes lpips but converted weights "
                             "are missing (tools/convert_lpips.py)")
        lpips_weights = lpips_mod.load_weights()
    from evreal_tpu.train import build_optimizer

    optimizer = build_optimizer(
        lr=args.lr, schedule=args.lr_schedule, steps=args.steps,
        warmup=args.warmup, weight_decay=args.weight_decay,
        clip_grad=args.clip_grad)
    step_fn, opt = make_train_step(model, optimizer, mesh=mesh,
                                   loss=args.loss,
                                   lpips_weights=lpips_weights,
                                   lpips_scale=args.lpips_scale)
    opt_state = opt.init(params)

    os.makedirs(args.out, exist_ok=True)
    manager = None
    start_step = 0
    if args.save_every > 0 or args.resume:
        # Job-level checkpoint/resume — the reference has model checkpoints
        # only, no job resume (SURVEY §5; eval_metrics.py:315-324 truncates
        # outputs every run).
        import orbax.checkpoint as ocp

        manager = ocp.CheckpointManager(
            os.path.abspath(os.path.join(args.out, "ckpt")),
            options=ocp.CheckpointManagerOptions(max_to_keep=3))
        latest = manager.latest_step()
        if args.resume and latest is not None:
            restored = manager.restore(
                latest, args=ocp.args.StandardRestore(
                    {"params": params, "opt_state": opt_state}))
            params, opt_state = restored["params"], restored["opt_state"]
            start_step = latest
            print(f"resumed from step {latest}", flush=True)

    import time as _time

    log_t, log_step = None, start_step
    for step in range(start_step + 1, args.steps + 1):
        # per-step generator: a resumed run reproduces exactly the batch
        # stream an uninterrupted run would have consumed, with no replay
        rng = np.random.default_rng((args.seed, step))
        batch = sample_batch(seqs, voxelize, rng, args.batch, args.chunk_t,
                             args.num_bins, crop)
        if mesh is not None:
            batch = {
                "voxels": jax.device_put(batch["voxels"],
                                         batch_sharding(mesh, 5, 0, 3)),
                "frames": jax.device_put(batch["frames"],
                                         batch_sharding(mesh, 4, 0, 3)),
            }
        params, opt_state, loss = step_fn(params, opt_state, batch)
        if step % args.log_every == 0 or step == 1:
            loss_v = float(loss)  # device sync: wall below is real work
            now = _time.perf_counter()
            rate = ""
            if log_t is not None and step > log_step:
                rate = (f" ({(step - log_step) / (now - log_t):.2f} "
                        f"steps/s)")
            log_t, log_step = now, step
            print(f"step {step}: loss {loss_v:.5f}{rate}", flush=True)
        if manager is not None and args.save_every > 0 and \
                step % args.save_every == 0:
            import orbax.checkpoint as ocp

            manager.save(step, args=ocp.args.StandardSave(
                {"params": params, "opt_state": opt_state}))
    if manager is not None:
        manager.wait_until_finished()

    out_path = os.path.join(args.out, "model.npz")
    flat = {}

    def flatten(prefix, tree):
        for k, v in tree.items():
            key = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                flatten(key, v)
            else:
                flat[key] = np.asarray(v)

    flatten("", params)
    from evreal_tpu.convert.torch_ckpt import save_params

    # npz + meta sidecar: the trained checkpoint drops into a method
    # config's model_path and evaluates like any converted reference one
    save_params(out_path, flat, ckpt_meta)
    print(f"saved {out_path}")


if __name__ == "__main__":
    main()
