"""Batched multi-sequence evaluation — the TPU-native scaling axis.

The reference evaluates sequences strictly serially (eval.py:354-366). The
recurrence forces frame t to follow frame t-1 *within* a sequence, but
sequences are independent, so N sequences of one dataset run in lockstep as a
batch dimension through a single scanned program: state pytrees carry an N
axis, the MXU sees N-fold larger convolutions, and per-chunk dispatch cost is
amortized N-fold. Per-sequence windowing, eval-window gating and output files
are untouched host-side concerns.

Under a multi-device mesh the batch axis shards over 'dp' (embarrassingly
parallel; no collectives in the step).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from evreal_tpu.data.packing import (
    outlier_buffers,
    pack_windows,
    plan_capacity,
)
from evreal_tpu.harness.timers import DeviceTimer
from evreal_tpu.metrics import registry as metric_registry
from evreal_tpu.ops.pad import CropParams


_EVAL_MESH = "unset"


def get_eval_mesh():
    """Mesh for sharding the sequence batch over devices ('dp'). Auto-created
    when more than one device is visible; EVREAL_MESH=0 disables."""
    global _EVAL_MESH
    if _EVAL_MESH == "unset":
        if os.environ.get("EVREAL_MESH", "1") == "0":
            _EVAL_MESH = None
        else:
            devices = jax.devices()
            if len(devices) > 1:
                from evreal_tpu.parallel.mesh import make_mesh

                _EVAL_MESH = make_mesh(len(devices), axes=("dp",),
                                       devices=devices)
            else:
                _EVAL_MESH = None
    return _EVAL_MESH


class BatchedRunner:
    """Compiled lockstep pipeline over a batch of n sequences."""

    def __init__(self, model, params, *, event_norm, post_norm, height,
                 width, num_bins, n, chunk_t=None, mesh=None):
        from evreal_tpu.harness.runner import (
            DEFAULT_CHUNK_T,
            default_voxelize_impl,
            make_voxel_stage,
        )

        if chunk_t is None:  # honor EVREAL_CHUNK_T like the single-seq path
            chunk_t = DEFAULT_CHUNK_T

        self.model = model
        self.params = params
        self.post_norm = post_norm
        self.h, self.w = height, width
        self.n = n
        self.chunk_t = chunk_t
        self.mesh = mesh
        self.crop = CropParams(width, height, model.num_encoders)
        impl = default_voxelize_impl()
        from evreal_tpu.harness.runner import (
            FUSED,
            cast_params,
            compute_dtype,
            resolve_voxelize_fn,
        )

        self.fused = FUSED  # captured at construction (A/B tools flip it)
        if impl == "pallas" and not self.fused:
            # the two-stage program vmaps the stage over N sequences, which
            # the whole-chunk Pallas kernel can't lower under; the fused
            # scan feeds it (N, E) windows per step — its native grid shape
            impl = "matmul"
        vox = resolve_voxelize_fn(impl)
        self._vox_impl = impl
        self.num_bins = num_bins
        self.event_norm = event_norm
        self.dtype = compute_dtype()
        # out_dtype inside the stage: the vmapped (N,T,H,W,B) voxel buffer
        # is materialized in the serving dtype (the largest allocation in
        # the b256 bf16 OOM dump was this buffer in f32)
        self.voxel_stage = make_voxel_stage(vox, num_bins, (height, width),
                                            event_norm,
                                            out_dtype=self.dtype)
        self._params_cast = cast_params(params, self.dtype)
        self._fn = None
        self._metric_fns = {}

    def init_state(self):
        from evreal_tpu.harness import staging

        staging.note_compute()  # dispatches a device program
        ph, pw = self.crop.padded_shape
        return self.model.init_state(self.n, ph, pw, dtype=self.dtype)

    def _build(self):
        from evreal_tpu.ops.normalize import post_process_normalization

        model, crop, post_norm = self.model, self.crop, self.post_norm
        voxel_stage = self.voxel_stage
        dtype = self.dtype

        def fn(params, state, bufs):
            from evreal_tpu.harness import runner as runner_mod
            from evreal_tpu.harness.runner import matmul_precision_ctx

            with matmul_precision_ctx(dtype):
                # inputs: per-event buffers (N, T, E) / count (N, T)
                if self.fused:
                    # one loop: each step voxelizes its own N windows, so
                    # the (N, T, B*H, W) voxel-scan carry / (N, T, H, W, B)
                    # buffer never materialize (runner.FUSED comment); the
                    # transposed (T, N, E) event copy is ~7x smaller than
                    # the voxel buffer it replaces
                    xs = {k: jnp.moveaxis(v, 1, 0) for k, v in bufs.items()}

                    def step(st, buf_t):
                        v = crop.pad(voxel_stage(buf_t))  # (N, ph, pw, B)
                        out, st = model.apply(params, st, v)
                        return st, out["image"]

                    state, imgs = jax.lax.scan(
                        step, state, xs, unroll=runner_mod.SCAN_UNROLL)
                else:
                    vox = jax.vmap(voxel_stage)(bufs)
                    vox = crop.pad(vox)  # stage emits `dtype`; pad is exact
                    vox = jnp.moveaxis(vox, 1, 0)  # (T, N, ph, pw, B)

                    def step(st, v):
                        out, st = model.apply(params, st, v)
                        return st, out["image"]

                    state, imgs = jax.lax.scan(
                        step, state, vox, unroll=runner_mod.SCAN_UNROLL)
                imgs = jnp.moveaxis(imgs.astype(jnp.float32), 0, 1)
                imgs = crop.crop(imgs)[..., 0]  # (N, T, H, W)
                imgs = jax.vmap(jax.vmap(
                    lambda im: post_process_normalization(im,
                                                          post_norm)))(imgs)
                clipped = jnp.clip(imgs, 0.0, 1.0)
                return state, imgs, clipped

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_spec = NamedSharding(self.mesh, P("dp"))

            def sharded(params, state, bufs):
                bufs = jax.tree.map(
                    lambda b: jax.lax.with_sharding_constraint(b, batch_spec),
                    bufs)
                return fn(params, state, bufs)

            return jax.jit(sharded)
        return jax.jit(fn)

    def cost_analysis(self, state, buffers):
        """Trip-count-aware (flops, bytes_accessed) XLA estimates of one
        ``run`` call at these shapes, or (None, None).

        Same composition as MethodRunner.cost_analysis (see its docstring:
        XLA counts ``while`` bodies once, so the compiled chunk program's
        own figure undercounts 10-25x): one voxel window x N*chunk_t, one
        batch-N model step x chunk_t, the post stage once — each a
        loop-free program compiled on the host CPU backend."""
        import jax.numpy as jnp
        import numpy as np

        from evreal_tpu.harness.runner import (
            loop_free_voxelize_fn,
            make_voxel_stage,
            matmul_precision_ctx,
        )
        from evreal_tpu.ops.normalize import post_process_normalization
        from evreal_tpu.utils.mfu import composed_cost

        t, n = self.chunk_t, self.n
        bufs1 = {k: jax.ShapeDtypeStruct((1,) + tuple(v.shape[2:]),
                                         np.result_type(v))
                 for k, v in buffers.items()}
        stage1 = make_voxel_stage(loop_free_voxelize_fn(self._vox_impl),
                                  self.num_bins, (self.h, self.w),
                                  self.event_norm, out_dtype=self.dtype)
        ph, pw = self.crop.padded_shape
        vox_sd = jax.ShapeDtypeStruct((n, ph, pw, self.num_bins), self.dtype)
        imgs_sd = jax.ShapeDtypeStruct((t, n, ph, pw, 1), self.dtype)
        model, crop, post_norm, dtype = (self.model, self.crop,
                                         self.post_norm, self.dtype)

        def step(params, st, v):
            with matmul_precision_ctx(dtype):
                out, st = model.apply(params, st, v)
                return st, out["image"]

        def post(imgs):
            with matmul_precision_ctx(dtype):
                x = jnp.moveaxis(imgs.astype(jnp.float32), 0, 1)
                x = crop.crop(x)[..., 0]
                x = jax.vmap(jax.vmap(
                    lambda im: post_process_normalization(im,
                                                          post_norm)))(x)
                return x, jnp.clip(x, 0.0, 1.0)

        return composed_cost([
            (stage1, (bufs1,), n * t),
            (step, (self._params_cast, state, vox_sd), t),
            (post, (imgs_sd,), 1),
        ])

    def run(self, state, buffers):
        # one jitted fn; jax.jit caches per input-shape signature
        from evreal_tpu.harness import staging

        staging.note_compute()
        if self._fn is None:
            self._fn = self._build()
        return self._fn(self._params_cast, state, dict(buffers))

    def quantize_u8(self, images):
        """Device-side PNG quantization (see MethodRunner.quantize_u8)."""
        from evreal_tpu.harness.runner import _quantize_u8

        return _quantize_u8(images)

    def metric_scores(self, specs, clipped, refs):
        """(N, T, H, W) images [vs refs] -> {name: (N, T)} device arrays."""
        specs = self._validate_specs(specs, tuple(clipped.shape[2:]))
        key = tuple(s.name for s in specs)
        # weights flow through the jit boundary as runtime arguments, not
        # closure constants (registry module docstring)
        aux = {s.name: s.loaded() for s in specs if s.params is not None}
        if key not in self._metric_fns:
            fr = [s for s in specs if not s.no_ref]
            nr = [s for s in specs if s.no_ref]

            @jax.jit
            def mfn(imgs, refs, aux):
                from evreal_tpu.harness.runner import matmul_precision_ctx

                def bind(s):
                    return ((lambda *a, s=s: s.fn(aux[s.name], *a))
                            if s.params is not None else s.fn)

                with matmul_precision_ctx():
                    vv = lambda f: jax.vmap(jax.vmap(f))
                    n, t = imgs.shape[:2]

                    def smap(f, *arrs):  # serial over N*T frames
                        flat = [a.reshape((n * t,) + a.shape[2:])
                                for a in arrs]
                        r = jax.lax.map(lambda xs: f(*xs), tuple(flat)) \
                            if len(flat) > 1 else jax.lax.map(f, flat[0])
                        return r.reshape(n, t)

                    out = {}
                    for s in fr:
                        f = bind(s)
                        out[s.name] = (smap(f, imgs, refs) if s.serial
                                       else vv(f)(imgs, refs))
                    for s in nr:
                        f = bind(s)
                        out[s.name] = (smap(f, imgs) if s.serial
                                       else vv(f)(imgs))
                    return out

            self._metric_fns[key] = mfn
        return self._metric_fns[key](clipped, refs, aux)

    def _validate_specs(self, specs, hw):
        from evreal_tpu.harness.runner import validate_metric_specs

        cache = getattr(self, "_spec_ok", None)
        if cache is None:
            cache = self._spec_ok = {}
        return validate_metric_specs(cache, specs, tuple(hw))


def eval_method_on_sequence_group(dataset_name, eval_config, method_name,
                                  bundle, method_config, sequences, metrics):
    """Evaluate one method on N same-resolution sequences in lockstep.
    Returns [(num_evaluated, mean_scores)] aligned with ``sequences``."""
    from evreal_tpu.harness import histeq as histeq_mod
    from evreal_tpu.harness.runner import PIPELINE_DEPTH

    seqs = [s["dataset"] for s in sequences]
    n = len(seqs)
    hist_eq = eval_config.get("histeq", "none")
    eval_infer_all = eval_config.get("eval_infer_all", False)

    specs = metric_registry.resolve(metrics)
    known = [s.name for s in specs]
    no_ref_names = tuple(s.name for s in specs if s.no_ref)

    from evreal_tpu.harness.runner import (
        check_resume,
        gate_windows,
        make_tracker,
        sequence_output_dir,
    )
    from evreal_tpu.metrics.tracker import (resume_enabled,
                                            resume_settings,
                                            sequence_settings)

    settings = resume_settings(eval_config)
    if resume_enabled():
        finished, keep = {}, []
        for i, (s, seq) in enumerate(zip(sequences, seqs)):
            output_dir = sequence_output_dir(eval_config, dataset_name,
                                             s["name"], method_name)
            done = check_resume(output_dir, seq, known, no_ref_names,
                                sequence_settings(settings, s))
            if done is not None:
                print(f"Skipping finished {output_dir} (EVREAL_RESUME)")
                finished[i] = done
            else:
                keep.append(i)
        if finished:
            sub = (eval_method_on_sequence_group(
                dataset_name, eval_config, method_name, bundle,
                method_config, [sequences[i] for i in keep], metrics)
                if keep else [])
            for j, i in enumerate(keep):
                finished[i] = sub[j]
            return [finished[i] for i in range(len(sequences))]

    trackers, procs, metas_all = [], [], []
    for s, seq in zip(sequences, seqs):
        output_dir = sequence_output_dir(eval_config, dataset_name,
                                         s["name"], method_name)
        trackers.append(make_tracker(output_dir, eval_config, s, seq,
                                     known, no_ref_names, settings))
        metas = seq.windows()
        procs.append(gate_windows(metas, s["start_time_s"],
                                  s["end_time_s"], eval_infer_all))
        metas_all.append(metas)

    resolution = seqs[0].sensor_resolution
    mesh = get_eval_mesh()
    n_pad = n
    if mesh is not None:
        dp = mesh.shape["dp"]
        n_pad = -(-n // dp) * dp  # dp-divisible batch; extra rows are
        # zero-event and their outputs are never read
    runner = bundle.batched_runner_for(resolution, method_config,
                                       seqs[0].num_bins, n_pad)
    chunk_t = runner.chunk_t
    capacity = plan_capacity(metas_all[k][i]["event_count"]
                             for k in range(n) for i in procs[k])
    post_norm = method_config.get("post_process_norm", "none")
    any_images = any(seq.has_images for seq in seqs)
    total_frames = sum(len(p) for p in procs)
    max_chunks = max((-(-len(p) // chunk_t) for p in procs), default=0)

    # wire-format dtypes as emitted by pack_windows (int16 coords unless any
    # sequence has fractional on-disk coords, int8 +-1 polarity; EVREAL_WIRE=
    # compact narrows ts to u16 fractions and coords to u8 when the sensor
    # fits; compact4 packs each event into one u32) — the streamed loop is
    # host->device-bound, so wire bytes are fps
    from evreal_tpu.data.packing import wire_dtypes, wire_format

    int_coords = all(np.issubdtype(seq.xy.dtype, np.integer) for seq in seqs)
    dtypes = wire_dtypes(wire_format(), int_coords, resolution)

    # buffer pools, rotated per chunk: fresh np.zeros every chunk costs a
    # page fault per touched page (~2x host pack time measured at ECD scale
    # on this 1-core host). A set packed for chunk k is last referenced when
    # chunk k is drained, i.e. right after chunk k+PIPELINE_DEPTH-1 is
    # dispatched, so PIPELINE_DEPTH+1 sets make reuse race-free even when
    # the CPU backend aliases numpy buffers zero-copy.
    from evreal_tpu.data.packing import alloc_buffers

    n_pools = min(PIPELINE_DEPTH, max(max_chunks, 1)) + 1
    buf_pool = [alloc_buffers((n_pad, chunk_t), capacity, dtypes)
                for _ in range(n_pools)]
    # GT frames cross the tunnel as raw uint8 when every image-bearing
    # memmap stores u8 (runner.derefs converts on device, bit-identical
    # to Sequence.frame); hist-eq configs keep float32 pools because the
    # refs are equalized on host before scoring.
    def _u8_refs(j):
        s = seqs[j]
        f = getattr(s, "frame_u8", None)
        if f is None:
            return False
        i = next(iter(procs[j]), None)
        return i is None or f(metas_all[j][i]["frame_index"]) is not None

    ref_dtype = (np.uint8 if hist_eq == "none" and all(
        _u8_refs(j) for j in range(n) if seqs[j].has_images)
        else np.float32)
    refs_pool = [
        (np.zeros((n_pad, chunk_t) + tuple(resolution), ref_dtype)
         if any_images and known else None)
        for _ in range(n_pools)]

    def pack_chunk(k, with_refs=True):
        chunk_idxs = [proc[k * chunk_t:(k + 1) * chunk_t] for proc in procs]
        chunk_max = max((metas_all[j][i]["event_count"]
                         for j in range(n) for i in chunk_idxs[j]),
                        default=0)
        if chunk_max <= capacity:
            cap_c, zeroed = capacity, False
            bufs = buf_pool[k % n_pools]
            # ended/padding lanes must voxelize as zero-event windows, not
            # as whatever this set held PIPELINE_DEPTH chunks ago
            bufs["count"][:] = 0
        else:
            # outlier chunk (rare by plan_capacity construction): escalate
            # to its own bucket with one-off buffers instead of inflating
            # every pool for the whole run
            cap_c, bufs = outlier_buffers((n_pad, chunk_t), chunk_max,
                                          dtypes)
            zeroed = True
        chunk_info = []
        for j, (seq, proc) in enumerate(zip(seqs, procs)):
            idxs = chunk_idxs[j]
            chunk_info.append(idxs)
            if not idxs:
                continue
            t = len(idxs)
            views = {key: bufs[key][j, :t] for key in bufs}
            pack_windows(seq, idxs, capacity=cap_c, out=views,
                         metas=[metas_all[j][i] for i in idxs],
                         out_zeroed=zeroed)
        refs = (load_refs(chunk_info, refs_pool[k % n_pools]) if with_refs
                else None)
        return bufs, chunk_info, refs

    def load_refs(chunk_info, out):
        """Fill (and return) the pooled GT-frame array for one chunk from
        the memmaps — separated from pack_chunk so the hist-eq prestaged
        path can rebuild the host-side copy at dispatch time without
        repacking events (rows past len(idxs) may hold stale frames; they
        are never read: drain and the score tails both stop at
        len(idxs))."""
        if out is None:
            return None
        u8 = out.dtype == np.uint8
        for j, seq in enumerate(seqs):
            if not seq.has_images:
                continue
            for r, i in enumerate(chunk_info[j]):
                fi = metas_all[j][i]["frame_index"]
                out[j, r] = seq.frame_u8(fi) if u8 else seq.frame(fi)
        return out

    from evreal_tpu.harness import staging
    from evreal_tpu.harness.runner import fence, make_metric_containment

    live, probe_metrics, fetch_scores, dropped = make_metric_containment(
        runner, "group")

    # upload-ahead staging: device_put chunks (events + metric refs) while
    # the process is still in its fast pre-compute H2D state; the loop
    # below then dispatches from HBM (harness/staging.py; budget-bounded —
    # on exhaustion the remaining chunks stream as before)
    staged = {}
    if max_chunks and staging.active():
        staging.preload_metric_params(specs)
        want_refs = any_images and bool(known) and hist_eq == "none"
        for k in range(max_chunks):
            # with_refs only when they will be staged: hist-eq configs
            # would otherwise read every GT frame twice (here + dispatch)
            bufs, chunk_info, refs = pack_chunk(k, with_refs=want_refs)
            tree = {"bufs": dict(bufs)}
            if want_refs and refs is not None:
                tree["refs"] = refs
            dev = staging.stage(tree)
            if dev is None:
                break  # budget exhausted; the rest streams per chunk
            staged[k] = dev

    state = runner.init_state()

    def drain(entry):
        chunk_info, refs, images_dev, clipped_dev, scores_dev, entry_use, \
            refs_dev = entry
        from evreal_tpu.utils import bounded_fetch

        # u8 frames (quantized on device) or None when save_images is off.
        # Bounded-slice fetches: a whole-chunk (lanes, T, H, W) array at
        # high lane counts / big sensors can exceed the ~10 MB single-fetch
        # ceiling that wedges this backend's transfer path (CLAUDE.md).
        # Sliced to the real lanes ON DEVICE first: mesh padding lanes
        # (n_pad > n) are dead D2H bytes whose outputs are never read.
        n_real = len(chunk_info)
        images = (bounded_fetch(images_dev[:n_real])
                  if images_dev is not None else None)
        scores = (fetch_scores(scores_dev, entry_use, clipped_dev, refs_dev)
                  if scores_dev else {})
        proc_imgs = None
        if hist_eq != "none":
            # clipped only comes to host for hist-eq (tracker re-clips
            # `images` itself). Process the whole chunk and score it in ONE
            # batched device call — per-frame calls would serialize on the
            # tunnel round-trip (~100s of ms each). Real lanes only: the
            # per-run lane count is constant, so the metric program's
            # (n_real, T) signature still compiles exactly once.
            clipped = bounded_fetch(clipped_dev[:n_real])
            proc_imgs = np.zeros_like(clipped)
            proc_refs = np.zeros_like(clipped)
            for j, idxs in enumerate(chunk_info):
                for r in range(len(idxs)):
                    proc_imgs[j, r] = histeq_mod.histogram_equalization(
                        clipped[j, r], hist_eq)
                    if refs is not None and seqs[j].has_images:
                        proc_refs[j, r] = histeq_mod.histogram_equalization(
                            np.clip(refs[j, r], 0, 1), hist_eq)
            use = live(specs if any_images
                       else [s for s in specs if s.no_ref])
            if use:
                pi = jnp.asarray(proc_imgs)
                pr = jnp.asarray(proc_refs)
                try:
                    scores = fetch_scores(runner.metric_scores(use, pi, pr),
                                          use, pi, pr)
                except Exception:  # noqa: BLE001 — sync-backend failure
                    scores = probe_metrics(use, pi, pr)
        for j, idxs in enumerate(chunk_info):
            seq, tracker = seqs[j], trackers[j]
            for r, i in enumerate(idxs):
                meta = metas_all[j][i]
                img = images[j, r] if images is not None else None
                ref = refs[j, r] if (refs is not None and seq.has_images) \
                    else None
                # trackers of ref-less sequences only record no-ref metric
                # names, so FR scores computed against the zero refs above
                # are dropped there
                frame_scores = {k: v[j, r] for k, v in scores.items()}
                tracker.update(
                    i, img, ref, meta["voxel_timestamp"],
                    meta["frame_timestamp"] if seq.has_images else None,
                    scores=frame_scores,
                    processed_img=(proc_imgs[j, r] if proc_imgs is not None
                                   else None))
                rate = (0 if meta["event_count"] <= 1 or meta["dt"] == 0
                        else meta["event_count"] / meta["dt"])
                tracker.save_custom_metric(i, "event_rate", rate)

    pending = []
    timer = DeviceTimer(method_name, frames=max(total_frames, 1))
    timer.__enter__()
    for k in range(max_chunks):
        staged_refs = None
        if k in staged:
            dev = staged.pop(k)
            bufs, staged_refs = dev["bufs"], dev.get("refs")
            chunk_info = [proc[k * chunk_t:(k + 1) * chunk_t]
                          for proc in procs]
            # no host-side ref copy needed in the std path: the tracker
            # never reads ref pixel data, and scoring uses staged_refs
            refs = (None if hist_eq == "none"
                    else load_refs(chunk_info, refs_pool[k % n_pools]))
        else:
            bufs, chunk_info, refs = pack_chunk(k)
        state, images, clipped = runner.run(state, bufs)
        # device-quantized u8 frames: 4x fewer D2H bytes, and no image
        # fetch at all when nothing will be saved
        images = (runner.quantize_u8(images)
                  if any(t.save_images for t in trackers) else None)
        scores_dev = None
        r = None
        use = live(specs if any_images
                   else [s for s in specs if s.no_ref])
        if use and hist_eq == "none":
            r = (staged_refs if staged_refs is not None
                 else jnp.asarray(refs) if refs is not None
                 else jnp.zeros_like(clipped))
            if r.dtype == jnp.uint8:
                # standalone u8->f32 program (runner.derefs): the metric
                # program then sees the identical f32 trace either way
                from evreal_tpu.harness.runner import derefs
                r = derefs(r)
            try:
                scores_dev = runner.metric_scores(use, clipped, r)
            except Exception:  # noqa: BLE001 — on a synchronous backend
                # the runtime failure surfaces at the call
                scores_dev = probe_metrics(use, clipped, r)
        pending.append((chunk_info, refs, images, clipped, scores_dev, use,
                        r))
        if k == 0 and max_chunks > 1:
            # first chunk bears the jit compiles (model program at run();
            # metric program at metric_scores() — for hist-eq configs that
            # happens inside drain()); complete it fully, then restart the
            # timer so the sample is steady-state ms/frame
            if hist_eq != "none":
                drain(pending.pop(0))  # metric program compiles here
            try:
                fence((state, scores_dev))
            except Exception:  # noqa: BLE001 — a failing host-callback
                pass           # metric is contained at drain time instead
            timer.exclude_warmup(sum(len(i) for i in chunk_info))
        if len(pending) >= PIPELINE_DEPTH:
            drain(pending.pop(0))
    for entry in pending:
        drain(entry)
    if max_chunks:
        # value-fetch fence, not block_until_ready: the timing boundary
        # must be trustworthy (CLAUDE.md; runner.fence docstring)
        fence((state,))
    timer.__exit__()

    results = []
    first_err = None
    for tracker, proc in zip(trackers, procs):
        # finalize every tracker even if one sequence's writer failed —
        # otherwise the rest would silently drop queued PNGs
        try:
            tracker.finalize(proc[-1] if proc else 0, dropped=dropped)
            if eval_config.get("create_video", False):
                tracker.create_video()
                if hist_eq != "none":
                    tracker.create_processed_video()
        except Exception as e:  # noqa: BLE001 — re-raised after the loop
            if first_err is None:
                first_err = e
        results.append((tracker.get_num_quan_evaluations(),
                        tracker.get_mean_scores()))
    if first_err is not None:
        raise first_err
    return results
