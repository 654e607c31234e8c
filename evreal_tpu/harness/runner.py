"""Evaluation driver: the TPU-native counterpart of the reference eval loop
(eval.py:189-455).

Instead of a per-frame Python loop with three host<->device crossings per
frame (reference §3.1: CPU voxelize -> GPU forward -> CPU metrics), whole
chunks of T windows run as one compiled XLA program — a single lax.scan
whose step voxelizes its own window and applies the model (see FUSED):

    packed events (T,E) -> lax.scan(voxelize -> input norm -> pad ->
    model) -> crop -> post-norm -> clip  [+ batched metrics]

Only packed event buffers go up and images/score scalars come back. Programs
are cached per (method, padded resolution, event-capacity bucket).
"""

import glob
import hashlib
import os
import traceback
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from evreal_tpu.convert import load_method_checkpoint, load_params, nest, save_params
from evreal_tpu.data import Sequence, pack_windows, plan_capacity
from evreal_tpu.data.packing import outlier_buffers
from evreal_tpu.harness import histeq as histeq_mod
from evreal_tpu.harness import staging
from evreal_tpu.harness.config import (
    get_dataset_configs,
    get_eval_configs,
    get_method_config,
)
from evreal_tpu.harness.tables import color_error, color_progress, print_scores
from evreal_tpu.harness.timers import DeviceTimer
from evreal_tpu.metrics import registry as metric_registry
from evreal_tpu.metrics.tracker import (EvalMetricsTracker, MetricTracker,
                                        sequence_settings)
from evreal_tpu.models import build_from_meta
from evreal_tpu.ops.normalize import normalize_event_tensor, post_process_normalization
from evreal_tpu.ops.pad import CropParams
from evreal_tpu.ops.voxelize import voxelize_matmul, voxelize_scatter

DEFAULT_CHUNK_T = int(os.environ.get("EVREAL_CHUNK_T", "32"))
# parsed at import so a malformed value fails fast, not inside the
# per-dataset containment try (which would degrade every dataset to a
# printed traceback and an empty score table)
DEFAULT_BATCH_N = int(os.environ.get("EVREAL_BATCH_N", "0"))
# Unroll factor for the per-window model scan (lax.scan ``unroll``): eval is
# op-latency-bound (BASELINE.md roofline), so amortizing loop bookkeeping
# across iterations is a real lever — A/B'd on a healthy chip (E2VID b16
# lockstep): bf16 727 -> 1002 fps at unroll=4 (+38%; 1031 at 8, marginal),
# f32 +4%. Results are bit-identical across factors incl. a non-divisible
# remainder (tests/test_scan_unroll.py). Default stays 1 because compile
# cost is wildly program-dependent on this toolchain: the batched E2VID
# programs compile unroll=4 in normal time, but the single-sequence
# FireNet+ program at ECD scale stalled XLA for >9 min (measured healthy
# chip, 2026-08-17) vs seconds at unroll=1. bench.py opts the lockstep
# serving config into 4 explicitly.
SCAN_UNROLL = int(os.environ.get("EVREAL_SCAN_UNROLL", "1"))
PIPELINE_DEPTH = 8  # chunks in flight on device before the host drains one
# Fuse voxelization into the model scan body: the chunk program becomes ONE
# loop whose step voxelizes its own window, instead of a voxel stage vmapped
# over all lanes x chunk_t windows feeding a separate model scan. The two
# largest allocations of the two-stage program — the vmapped voxelizer's
# (lanes, T, B*H, W) f32 event-chunk scan carry and the (lanes, T, H, W, B)
# voxel buffer, 7.06 GB + several GB at b256 (the r03 OOM dump) — never
# materialize; per scan step only (lanes, B*H, W) lives, T times smaller.
# The voxel grids are consumed once, one window at a time, by the model
# scan, so materializing the whole chunk was pure dead bandwidth in the
# HBM-bound regime. EVREAL_FUSED=0 restores the two-stage program as an
# A/B control.
FUSED = os.environ.get("EVREAL_FUSED", "1") != "0"


def voxel_precision_choice(supported, out_dtype):
    """Binning-dot precision for the selected voxelizer: the validated
    EVREAL_VOXEL_PRECISION override, else 'default' for bf16 stages (see
    make_voxel_stage docstring), else None (each impl's own default —
    matmul HIGH, pallas HIGHEST). ``supported`` is the precision names the
    impl can honor (matmul: all three; the Pallas windows kernel:
    highest|default — Mosaic does not lower HIGH; scatter: none). A
    precision pin the impl cannot honor is an operator error, not a
    silent no-op."""
    choice = os.environ.get("EVREAL_VOXEL_PRECISION")
    if choice is not None:
        if choice not in ("highest", "high", "default"):
            raise ValueError(f"EVREAL_VOXEL_PRECISION={choice!r}: "
                             "expected highest|high|default")
        if choice not in supported:
            raise ValueError(
                f"EVREAL_VOXEL_PRECISION={choice!r}: the selected "
                f"EVREAL_VOXELIZE impl cannot honor it (supports: "
                f"{', '.join(supported) or 'none — scatter has no dot'})")
        return choice
    if "default" in supported \
            and np.dtype(out_dtype) == np.dtype(jnp.bfloat16):
        return "default"
    return None


def make_voxel_stage(vox_fn, num_bins, hw, event_norm,
                     out_dtype=jnp.float32):
    """Jittable event-buffer-dict -> (T, H, W, B) voxel stage shared by the
    grayscale and color runners.

    ``bufs`` is a wire-format buffer dict (data/packing.py):
    {xs, ys, ts, ps, count} on the f32/compact wires — compact packed
    dtypes (int16/uint8 coords, int8 ±1 polarity, float32 or uint16
    timestamps) upcast on device, where the conversion fuses into the
    binning program — or {ev, count} on the packed-u32 compact4 wire,
    decoded here (ops/voxelize.decode_compact4). ``vox_fn`` may be a
    per-window function (vmapped here) or a whole-chunk kernel marked with
    ``windows_batched`` (the batched Pallas kernel).

    EVREAL_VOXEL_PRECISION (highest|high|default) overrides the matmul
    voxelizer's binning-dot precision (ops/voxelize.voxelize_matmul
    docstring). Unset, the choice follows ``out_dtype``: f32 stages use
    HIGH (3 bf16 MXU passes, ~2e-5 voxel error — the strict-parity
    choice); a bf16 serving stage uses DEFAULT (1 pass), whose ~5e-3
    absolute binning error is *below* the ~2e-2 rounding the bf16
    materialization itself applies to O(1-10) voxel values — measured
    1.11-1.24x end-to-end on the b128 bf16 lockstep (BASELINE.md,
    "Voxel binning precision follows the serving dtype")."""
    windows_batched = getattr(vox_fn, "windows_batched", False)
    is_matmul = (vox_fn is voxelize_matmul
                 or getattr(vox_fn, "func", None) is voxelize_matmul)
    supported = (("highest", "high", "default") if is_matmul
                 else getattr(vox_fn, "supported_precisions", ()))
    choice = voxel_precision_choice(supported, out_dtype)
    if choice is not None:
        import functools

        # wrap vox_fn itself (it may be the loop-free cost variant's
        # chunk-pinning partial, whose kwargs must survive)
        vox_fn = functools.partial(
            vox_fn, precision=getattr(jax.lax.Precision, choice.upper()))

    def stage(bufs):
        count = bufs["count"]
        if "ev" in bufs:
            from evreal_tpu.ops.voxelize import decode_compact4

            xs, ys, ts, ps = decode_compact4(bufs["ev"], hw)
        else:
            xs, ys, ts, ps = bufs["xs"], bufs["ys"], bufs["ts"], bufs["ps"]
            if ts.dtype != jnp.uint16:  # compact wire: dtype = semantics
                ts = ts.astype(jnp.float32)  # (ops/voxelize._t_norm)
            ps = ps.astype(jnp.float32)

        if windows_batched:
            vox = jnp.transpose(vox_fn(xs, ys, ts, ps, count, num_bins, hw),
                                (0, 2, 3, 1))
        else:
            def one(x, y, t, p, c):
                return jnp.transpose(vox_fn(x, y, t, p, c, num_bins, hw),
                                     (1, 2, 0))

            vox = jax.vmap(one)(xs, ys, ts, ps, count)
        if event_norm:
            vox = jax.vmap(normalize_event_tensor)(vox)
        # Serving-dtype cast INSIDE the stage: binning/normalization stay
        # f32 and the rounding point is identical to casting the caller's
        # result, but XLA can fuse the cast into the binning epilogue, so
        # the materialized (lanes, T, H, W, B) voxel buffer — the largest
        # allocation in the b256 bf16 OOM dump — is held in the serving
        # dtype rather than f32.
        return vox.astype(out_dtype)

    return stage


def default_voxelize_impl():
    """'matmul' (MXU one-hot contraction) on TPU, 'scatter' elsewhere.
    Override with EVREAL_VOXELIZE=matmul|scatter|pallas. Measured on v5e at
    ECD scale (32x30k events, same chip state): matmul@HIGH 107-129 Mev/s,
    batched Pallas kernel 46-49 Mev/s (Mosaic only lowers HIGHEST = 2x the
    MXU passes of HIGH, and VMEM caps the event-chunk tile), XLA scatter
    45 Mev/s — so the XLA matmul is the default. In the fused b128 bf16
    serving program the gap holds: pallas (bf16 factors, VMEM-blocked B*H)
    0.783 vs matmul 0.453 ms/frame end-to-end — the kernel regenerates
    one-hot factors on the VPU per B*H block while XLA builds them once
    and feeds one full-width MXU dot (BASELINE.md round 4)."""
    env = os.environ.get("EVREAL_VOXELIZE")
    if env in ("matmul", "scatter", "pallas"):
        return env
    return "matmul" if jax.default_backend() == "tpu" else "scatter"


def loop_free_voxelize_fn(impl):
    """Single-trip variant of the voxelizer for cost accounting.

    ``voxelize_matmul``'s event-chunk lax.scan compiles to a ``while`` whose
    body XLA's cost_analysis counts once; with ``chunk`` >= capacity the scan
    is one trip, so count-body-once is exact — and the one-hot matmul's
    total FLOPs are chunking-invariant (2*E*num_bins*H*W either way). The
    Pallas kernel does the same logical work as the matmul and can't compile
    on the CPU cost backend, so it's priced as the matmul."""
    if impl == "scatter":
        return voxelize_scatter

    import functools

    # a bare partial (not a def) so make_voxel_stage recognizes it as the
    # matmul and applies the same EVREAL_VOXEL_PRECISION / bf16-default
    # binning-precision choice the executed program gets
    return functools.partial(voxelize_matmul, chunk=1 << 30)


def resolve_voxelize_fn(impl):
    if impl == "pallas":
        from evreal_tpu.kernels.voxelize_pallas import (
            voxelize_pallas_windows)

        return voxelize_pallas_windows
    return voxelize_matmul if impl == "matmul" else voxelize_scatter


def compute_dtype():
    """Model compute dtype: EVREAL_DTYPE=bfloat16 trades ~1e-2 image accuracy
    for MXU-rate inference; default float32 for reference parity."""
    name = os.environ.get("EVREAL_DTYPE", "float32")
    return jnp.bfloat16 if name in ("bfloat16", "bf16") else jnp.float32


def cast_params(params, dtype):
    """Cast a param tree for serving dtype. Host-side (numpy + ml_dtypes,
    same round-to-nearest-even as XLA's convert_element_type) for numpy
    leaves: a jnp cast in a runner's __init__ would dispatch device
    programs before the staging loop, collapsing the pre-compute H2D
    window staging exists to ride (staging.py) — and uploading the halved
    bf16 bytes is itself cheaper. Device-resident leaves (already past
    that window) cast with jnp."""
    if dtype == jnp.float32:
        return params
    npdt = np.dtype(dtype)
    return jax.tree.map(
        lambda a: (a.astype(npdt) if isinstance(a, np.ndarray)
                   else jnp.asarray(a, dtype)), params)


def matmul_precision_ctx(dtype=jnp.float32):
    """Trace-time matmul precision for the compiled pipelines.

    TPU's default is a single bf16 pass even for f32 arrays; measured on
    FireNet+ golden weights that drifts reconstructions by up to 7.5e-3 vs
    CPU f32, while 'highest' stays at 4e-5 — and eval-scale convs are not
    MXU-bound, so the cost is nil (bench: within tunnel noise). Strict-parity
    f32 mode therefore pins 'highest'; bf16 mode keeps the backend default
    (precision is the explicit trade there).

    ``EVREAL_PRECISION`` overrides the f32 pin (highest | high | default):
    'high' is a 3-pass bf16 scheme. Measured (throttled chip state): E2VID
    batched pipeline within noise, ET-Net ~5% — these pipelines are not
    MXU-pass-bound, so the knob is an experiment lever, not a speed lever;
    use EVREAL_DTYPE=bfloat16 for the real precision/speed trade."""
    import contextlib

    if dtype == jnp.float32:
        prec = os.environ.get("EVREAL_PRECISION", "highest")
        if prec not in ("highest", "high", "default"):
            raise ValueError(f"EVREAL_PRECISION={prec!r}: expected "
                             "highest|high|default")
        return jax.default_matmul_precision(prec)
    return contextlib.nullcontext()


# ---------------------------------------------------------------------------
# model loading
# ---------------------------------------------------------------------------

def post_process_normalization_np(img, norm):
    """Host (numpy) variant of ops.normalize.post_process_normalization for
    images merged on host (color path)."""
    if norm == "none" or norm is None:
        return img
    if norm == "exprobust":
        img = np.exp(img)
        norm = "robust"
    if norm not in ("robust", "standard"):
        raise ValueError(f"Unrecognized image normalization: {norm}")
    qlo, qhi = (1, 99) if norm == "robust" else (0, 100)
    lo = np.percentile(img.ravel(), qlo)
    hi = np.percentile(img.ravel(), qhi)
    return (img - lo) / (hi - lo)


def _repo_root():
    return os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        os.pardir, os.pardir))


def _converted_cache_path(method_name, pth):
    """Repo-local cache location for a converted checkpoint. Keyed by method
    name plus a digest of the source path so switching a method's
    ``model_path`` never picks up a stale conversion. In-repo sources are
    keyed by repo-relative path, so a cache entry stays valid across
    checkout locations; external sources by absolute path. Never a sibling
    of the source ``.pth`` — the source tree may be read-only or external."""
    ap = os.path.abspath(pth)
    root = _repo_root()
    key = os.path.relpath(ap, root) if ap.startswith(root + os.sep) else ap
    digest = hashlib.sha1(key.encode()).hexdigest()[:10]
    stem = os.path.splitext(os.path.basename(pth))[0]
    return os.path.join(root, "weights", "converted", method_name,
                        f"{stem}-{digest}.npz")


def _convert_and_cache(method_name, pth, cache):
    flat, meta = load_method_checkpoint(method_name, pth)
    try:
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        save_params(cache, flat, meta)
    except OSError:
        pass
    return nest(flat), meta


def load_method_params(method_config):
    """Resolve a method's converted-param file; auto-convert a torch ``.pth``
    on first use (conversion is offline-torch, eval is pure JAX). Conversions
    are cached under the repo's ``weights/converted/<method>/`` — never
    written beside the source checkpoint, which may live in a read-only or
    external tree. A pre-existing sibling ``.npz`` is still honored as a
    read path."""
    path = method_config["model_path"]
    if not os.path.isabs(path) and not os.path.exists(path):
        candidate = os.path.join(_repo_root(), path)
        if os.path.exists(candidate) or os.path.exists(
                os.path.splitext(candidate)[0] + ".pth"):
            path = candidate
    if not path.endswith(".npz"):
        path = os.path.splitext(path)[0] + ".npz"
    pth = os.path.splitext(path)[0] + ".pth"
    if not os.path.exists(path):
        if not os.path.exists(pth):
            raise FileNotFoundError(
                f"neither {path} nor {pth} exists; place the reference "
                f"checkpoint at {pth} (it will be converted on first use)")
        cache = _converted_cache_path(method_config["model_name"], pth)
        if os.path.exists(cache):
            try:
                return load_params(cache)
            except FileNotFoundError:
                pass  # cached .npz lost its meta sidecar: re-convert below
        return _convert_and_cache(method_config["model_name"], pth, cache)
    try:
        return load_params(path)
    except FileNotFoundError:
        # explicit .npz without its meta sidecar (e.g. the sidecar write
        # failed on a previous run): fall back to the repo cache, converting
        # from the .pth once if needed, rather than staying permanently
        # broken or re-converting on every run
        if not os.path.exists(pth):
            raise
        cache = _converted_cache_path(method_config["model_name"], pth)
        if os.path.exists(cache):
            try:
                return load_params(cache)
            except FileNotFoundError:
                pass  # cache lost its sidecar too: re-convert below
        return _convert_and_cache(method_config["model_name"], pth, cache)


def split_groups(groups, cap_n):
    """Cap lockstep group width at cap_n sequences (EVREAL_BATCH_N): HBM
    scales with lanes x resolution (e.g. FPVDR puts 26 sequences in one
    same-resolution group). 0 = unlimited."""
    if cap_n <= 0:
        return groups
    return [g[i:i + cap_n] for g in groups
            for i in range(0, len(g), cap_n)]


def sequence_output_dir(eval_config, dataset_name, seq_name, method_name):
    """outputs/<eval_cfg>/<dataset>/<sequence>/<method> (reference
    eval.py:168)."""
    return os.path.join("outputs", eval_config["name"], dataset_name,
                        seq_name, method_name)


def check_resume(output_dir, seq, known, no_ref_names, settings):
    """EVREAL_RESUME: recorded (count, scores) for a finished output dir, or
    None. Ref-less sequences only ever record no-ref metrics."""
    from evreal_tpu.metrics.tracker import load_completed

    expected = (known if seq.has_images
                else [m for m in known if m in no_ref_names])
    return load_completed(output_dir, expected, settings)


def make_tracker(output_dir, eval_config, sequence, seq, known,
                 no_ref_names, settings, color=False):
    """Per-sequence EvalMetricsTracker with the shared argument wiring
    (single-sequence and batched-group paths construct these in lockstep)."""
    save_images = eval_config.get("save_images", True)
    hist_eq = eval_config.get("histeq", "none")
    return EvalMetricsTracker(
        save_images=save_images,
        save_processed_images=save_images and hist_eq != "none",
        output_dir=output_dir, hist_eq=hist_eq,
        quan_eval_metric_names=known,
        quan_eval_start_time=sequence["start_time_s"],
        quan_eval_end_time=sequence["end_time_s"],
        quan_eval_ts_tol_ms=eval_config["ts_tol_ms"],
        has_reference_frames=seq.has_images, color=color,
        no_ref_metric_names=no_ref_names,
        run_settings=sequence_settings(settings, sequence))


def gate_windows(metas, start, end, eval_infer_all):
    """Window indices to process (reference eval.py:212-216: skip while
    voxel_ts < start-10s, stop past end; eval_infer_all disables the cut)."""
    proc = []
    for i, m in enumerate(metas):
        ts = m["voxel_timestamp"]
        if not eval_infer_all:
            if ts < start - 10:
                continue
            if ts > end:
                break
        proc.append(i)
    return proc


def fence(tree):
    """Synchronize every device array in the tree by *value fetch* —
    ``block_until_ready`` has been observed returning early on the axon TPU
    backend (CLAUDE.md 'Environment gotchas'); a host fetch is always
    trustworthy. Used to place timing boundaries.

    The fetch is a SCALAR reduction per leaf, never the leaf itself: a
    whole-leaf fetch is unbounded D2H (a b16 ConvLSTM state leaf at
    480x640 is ~1.2 GB — the single-fetch wedge class, CLAUDE.md) and
    would bill the transfer to the surrounding DeviceTimer window. The
    tiny reduction dispatch is negligible at a chunk boundary, and
    fetching its value forces the leaf's producing computation."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array):
            np.asarray(jnp.sum(leaf) if leaf.ndim else leaf)


def make_metric_containment(runner, scope):
    """Dead-metric bookkeeping shared by the single-sequence and batched
    runners. Returns (live, probe_metrics, fetch_scores, dead):

    - ``live(specs)`` filters out metrics already dropped;
    - ``probe_metrics`` re-runs metrics one at a time on a chunk to find
      which one failed, dropping offenders for the rest of the ``scope``.
      Host-callback metrics (niqe/brisque) execute nothing under the
      trace-time jax.eval_shape validation, so their errors can only
      surface at real execution — this is the runtime half of the
      reference's per-metric containment (eval_metrics.py:233-242);
    - ``fetch_scores`` np-ifies a score dict, falling back to the probe on
      an async runtime failure;
    - ``dead`` is the live, mutating set of dropped metric names — pass it
      to ``tracker.finalize(dropped=dead)`` so incomplete metrics are
      excluded from the done.json completion record.
    """
    dead = set()

    def live(use):
        return [s for s in use if s.name not in dead]

    def probe_metrics(use, imgs_dev, refs_dev):
        out = {}
        for s in use:
            if s.name in dead:
                continue
            try:
                scores = runner.metric_scores([s], imgs_dev, refs_dev)
                if s.name not in scores:
                    # dropped by trace-time validation inside metric_scores,
                    # which already printed the real reason
                    dead.add(s.name)
                    continue
                out[s.name] = np.asarray(scores[s.name])
            except Exception as exc:  # noqa: BLE001
                dead.add(s.name)
                lines = str(exc).strip().splitlines()
                print(f"Metric {s.name} failed at runtime; dropping it "
                      f"for the rest of this {scope} "
                      f"({lines[-1][:200] if lines else exc})")
        return out

    def fetch_scores(scores_dev, use, imgs_dev, refs_dev):
        # scores_dev may already be a host dict when the dispatch site
        # contained a synchronous-backend failure via probe_metrics
        try:
            return {k: np.asarray(v) for k, v in scores_dev.items()}
        except Exception:  # noqa: BLE001 — async runtime failure
            return probe_metrics(use, imgs_dev, refs_dev)

    return live, probe_metrics, fetch_scores, dead


def validate_metric_specs(cache, specs, hw):
    """Keep only metrics whose fn traces at this image shape — the
    reference's per-metric exception containment (eval_metrics.py:233-242).
    ``cache`` maps (name, hw) -> bool across calls."""
    out = []
    for s in specs:
        ok = cache.get((s.name, hw))
        if ok is None:
            img = jax.ShapeDtypeStruct(hw, jnp.float32)
            try:
                fn = s.bound()
                jax.eval_shape(fn, img) if s.no_ref else \
                    jax.eval_shape(fn, img, img)
                ok = True
            except Exception as e:  # noqa: BLE001 — containment
                print(color_error(
                    f"metric {s.name} failed at {hw}: {e}; skipping"))
                ok = False
            cache[(s.name, hw)] = ok
        if ok:
            out.append(s)
    return out


# ---------------------------------------------------------------------------
# compiled per-method pipeline
# ---------------------------------------------------------------------------

@jax.jit
def _quantize_u8(images):
    return jnp.round(jnp.clip(images, 0.0, 1.0) * 255).astype(jnp.uint8)


# GT frames upload as raw uint8 (4x fewer tunnel bytes than the host-side
# astype(f32)/255 of Sequence.frame) and convert on device. A traced f32
# divide is NOT bit-identical to numpy's (XLA strength-reduces /255 to a
# reciprocal multiply: 1-ulp difference on 126 of 256 values, measured on
# both TPU and CPU backends), so the conversion is a 256-entry gather of
# host-computed values — exact by construction.
_U8_REF_LUT = np.arange(256, dtype=np.float32) / 255.0


@jax.jit
def derefs(refs):
    """uint8 reference frames -> float32 [0,1] on device, bit-identical to
    Sequence.frame's host conversion. Runs as its OWN program, before the
    metric call: converting inside the metric jit changes that program's
    fusion and was measured to perturb TPU score means by ~6e-10 — this
    way the metric program is the identical trace either way."""
    return jnp.asarray(_U8_REF_LUT)[refs.astype(jnp.int32)]


class MethodRunner:
    """Chunked, compiled eval pipeline for one (model, sensor resolution)."""

    def __init__(self, model, params, *, event_norm, post_norm, height, width,
                 num_bins, chunk_t=DEFAULT_CHUNK_T, voxelize_impl=None):
        self.model = model
        self.params = params
        self.event_norm = event_norm
        self.post_norm = post_norm
        self.h, self.w = height, width
        self.num_bins = num_bins
        self.chunk_t = chunk_t
        self.fused = FUSED  # captured at construction (A/B tools flip it)
        self.crop = CropParams(width, height, model.num_encoders)
        if voxelize_impl is None:
            voxelize_impl = default_voxelize_impl()
        self._vox_impl = voxelize_impl
        self._vox = resolve_voxelize_fn(voxelize_impl)
        self.dtype = compute_dtype()
        self.voxel_stage = make_voxel_stage(self._vox, num_bins,
                                            (height, width), event_norm,
                                            out_dtype=self.dtype)
        self._params_cast = cast_params(params, self.dtype)
        self._fn = None
        self._metric_fns = {}

    def init_state(self):
        staging.note_compute()  # dispatches a device program
        ph, pw = self.crop.padded_shape
        return self.model.init_state(1, ph, pw, dtype=self.dtype)

    def _build(self):
        model, crop = self.model, self.crop
        post_norm = self.post_norm
        voxel_stage = self.voxel_stage
        dtype = self.dtype

        def fn(params, state, bufs):
            with matmul_precision_ctx(dtype):
                # NOTE: ET-Net exposes encode_recurrent/decode_batched
                # (only its ConvLSTM stages are recurrent), but scanning
                # the prefix and batching the suffix over the chunk was
                # A/B'd at 105.2 vs 105.5 ms/frame monolithic — no gain
                # (and a much larger program to compile), so the harness
                # scans whole models uniformly. See BASELINE.md.
                if self.fused:
                    # one loop: each step voxelizes its own window, so the
                    # (T, B*H, W) voxel-scan carry / (T, H, W, B) buffer of
                    # the two-stage program never materialize (module FUSED
                    # comment)
                    def step(st, buf_t):
                        v = voxel_stage(jax.tree.map(lambda b: b[None],
                                                     buf_t))
                        out, st = model.apply(params, st, crop.pad(v))
                        return st, out["image"][0]

                    state, imgs = jax.lax.scan(step, state, dict(bufs),
                                               unroll=SCAN_UNROLL)
                else:
                    vox = crop.pad(voxel_stage(bufs))  # already `dtype`

                    def step(st, v):
                        out, st = model.apply(params, st, v[None])
                        return st, out["image"][0]

                    state, imgs = jax.lax.scan(step, state, vox,
                                               unroll=SCAN_UNROLL)
                imgs = crop.crop(imgs.astype(jnp.float32))[..., 0]  # (T,H,W)
                imgs = jax.vmap(lambda im: post_process_normalization(
                    im, post_norm))(imgs)
                clipped = jnp.clip(imgs, 0.0, 1.0)
                return state, imgs, clipped

        # NOTE: no donate_argnums — buffer donation triggers an
        # InvalidArgument on device->host transfers under the axon TPU
        # plugin (outputs alias donated storage); state is small anyway.
        return jax.jit(fn)

    def cost_analysis(self, state, buffers):
        """Trip-count-aware (flops, bytes_accessed) XLA estimates of one
        ``run`` call at these shapes, or (None, None).

        NOT the compiled chunk program's own cost_analysis: XLA counts a
        ``while`` body once, and the chunk program loops twice (model scan
        over chunk_t windows; the voxelizer's event-chunk scan), so the
        whole-program figure undercounted FLOPs 10-25x vs the profiler's
        per-kernel roofline (BASELINE.md "MFU accounting"). Each loop body
        is costed as its own loop-free program — compiled on the host CPU
        backend, so the diagnostic never costs a chip compile — and scaled
        by its trip count (utils.mfu.composed_cost). Reference
        counterpart: the CudaTimer ms table (utils/timers.py:28-37), which
        has no efficiency denominator at all."""
        from evreal_tpu.utils.mfu import composed_cost

        t = int(next(iter(buffers.values())).shape[0])
        bufs1 = {k: jax.ShapeDtypeStruct((1,) + tuple(v.shape[1:]),
                                         np.result_type(v))
                 for k, v in buffers.items()}
        stage1 = make_voxel_stage(loop_free_voxelize_fn(self._vox_impl),
                                  self.num_bins, (self.h, self.w),
                                  self.event_norm, out_dtype=self.dtype)
        ph, pw = self.crop.padded_shape
        vox_sd = jax.ShapeDtypeStruct((1, ph, pw, self.num_bins), self.dtype)
        imgs_sd = jax.ShapeDtypeStruct((t, ph, pw, 1), self.dtype)
        model, crop, post_norm, dtype = (self.model, self.crop,
                                         self.post_norm, self.dtype)

        def step(params, st, v):
            with matmul_precision_ctx(dtype):
                out, st = model.apply(params, st, v)
                return st, out["image"]

        def post(imgs):
            with matmul_precision_ctx(dtype):
                x = crop.crop(imgs.astype(jnp.float32))[..., 0]
                x = jax.vmap(lambda im: post_process_normalization(
                    im, post_norm))(x)
                return x, jnp.clip(x, 0.0, 1.0)

        return composed_cost([
            (stage1, (bufs1,), t),
            (step, (self._params_cast, state, vox_sd), t),
            (post, (imgs_sd,), 1),
        ])

    def run(self, state, buffers):
        # one jitted fn; jax.jit already caches compilations per
        # (capacity-bucket, dtype) signature
        staging.note_compute()
        if self._fn is None:
            self._fn = self._build()
        return self._fn(self._params_cast, state, dict(buffers))

    def quantize_u8(self, images):
        """PNG quantization on device: ``round(clip(img,0,1)*255)`` uint8,
        bit-identical to the host path in outputs.save_inferred_image
        (round-half-even both sides, IEEE f32 elementwise) — fetching u8
        costs a quarter of the f32 bytes on the ~45 MB/s tunnel D2H."""
        return _quantize_u8(images)

    def metric_scores(self, specs, clipped, refs):
        """Batched metric evaluation: (T,H,W) images [vs refs] ->
        {name: (T,)} device arrays (async). A metric whose fn fails to
        trace at these shapes is dropped with a warning and the others
        continue (the reference's per-metric containment,
        eval_metrics.py:233-242)."""
        specs = self._validate_specs(specs, clipped.shape[1:])
        key = tuple(s.name for s in specs)
        # weights flow through the jit boundary as runtime arguments, not
        # closure constants (registry module docstring: 400 MB of inlined
        # MANIQA constants exceeds the axon remote-compile request limit)
        aux = {s.name: s.loaded() for s in specs if s.params is not None}
        if key not in self._metric_fns:
            fr = [s for s in specs if not s.no_ref]
            nr = [s for s in specs if s.no_ref]

            @jax.jit
            def mfn(imgs, refs, aux):
                def bind(s):
                    return ((lambda *a, s=s: s.fn(aux[s.name], *a))
                            if s.params is not None else s.fn)

                with matmul_precision_ctx():
                    out = {}
                    for s in fr:
                        if s.serial:  # frame-at-a-time, bounds peak memory
                            out[s.name] = jax.lax.map(
                                lambda ab, f=bind(s): f(*ab), (imgs, refs))
                        else:
                            out[s.name] = jax.vmap(bind(s))(imgs, refs)
                    for s in nr:
                        out[s.name] = (jax.lax.map(bind(s), imgs)
                                       if s.serial
                                       else jax.vmap(bind(s))(imgs))
                    return out

            self._metric_fns[key] = mfn
        return self._metric_fns[key](clipped, refs, aux)

    def _validate_specs(self, specs, hw):
        cache = getattr(self, "_spec_ok", None)
        if cache is None:
            cache = self._spec_ok = {}
        return validate_metric_specs(cache, specs, tuple(hw))


# ---------------------------------------------------------------------------
# sequence / dataset assembly (reference eval.py:38-106)
# ---------------------------------------------------------------------------

def get_sequences(dataset_config, dataset_kwargs, seed=0):
    dataset_root = dataset_config["root_path"]
    get_all = dataset_config.get("get_all_sequences", False)
    has_subfolders = dataset_config.get("has_subfolders", False)
    dataset_kwargs = dict(dataset_kwargs)
    dataset_kwargs.update(dataset_config.get("dataset_kwargs", {}))
    sequences = []

    if get_all:
        pattern = os.path.join(dataset_root, "*", "*") if has_subfolders \
            else os.path.join(dataset_root, "*")
        seq_cfg = OrderedDict()
        for path in sorted(glob.glob(pattern)):
            if not os.path.isdir(path):
                continue
            name = (os.path.basename(os.path.dirname(path)) + "_" +
                    os.path.basename(path)) if has_subfolders \
                else os.path.basename(path)
            seq_cfg[name] = {"sequence_path": path}
    else:
        seq_cfg = dataset_config.get("sequences", {})

    for name, seq in seq_cfg.items():
        seq = dict(seq)
        seq_path = seq.get("sequence_path",
                           os.path.join(dataset_root, name))
        seq["name"] = name
        dataset = Sequence(seq_path, seed=seed, **dataset_kwargs)
        seq["dataset"] = dataset
        min_t, max_t = dataset.get_min_max_t()
        seq.setdefault("start_time_s", min_t)
        seq.setdefault("end_time_s", max_t)
        sequences.append(seq)
    return sequences


def get_datasets(dataset_configs, dataset_kwargs):
    return [{"name": c["name"],
             "sequences": get_sequences(c, dataset_kwargs)}
            for c in dataset_configs]


# ---------------------------------------------------------------------------
# per-sequence eval (reference eval.py:189-246)
# ---------------------------------------------------------------------------

def eval_method_on_sequence(dataset_name, eval_config, method_name, bundle,
                            method_config, sequence, metrics):
    seq = sequence["dataset"]
    color = eval_config.get("color", False)
    hist_eq = eval_config.get("histeq", "none")
    output_dir = sequence_output_dir(eval_config, dataset_name,
                                     sequence["name"], method_name)

    specs = metric_registry.resolve(metrics)
    known = [s.name for s in specs]
    no_ref_names = tuple(s.name for s in specs if s.no_ref)

    from evreal_tpu.metrics.tracker import resume_enabled, resume_settings

    settings = resume_settings(eval_config)
    if resume_enabled():
        done = check_resume(output_dir, seq, known, no_ref_names,
                            sequence_settings(settings, sequence))
        if done is not None:
            print(f"Skipping finished {output_dir} (EVREAL_RESUME)")
            return done

    tracker = make_tracker(output_dir, eval_config, sequence, seq, known,
                           no_ref_names, settings, color=color)

    eval_infer_all = eval_config.get("eval_infer_all", False)
    start, end = sequence["start_time_s"], sequence["end_time_s"]

    metas_all = seq.windows()
    proc = gate_windows(metas_all, start, end, eval_infer_all)

    if color:
        runner = bundle.color_runner_for(seq.sensor_resolution,
                                         method_config, seq.num_bins)
    else:
        runner = bundle.runner_for(seq.sensor_resolution, method_config,
                                   seq.num_bins)
    chunk_t = runner.chunk_t
    capacity = plan_capacity(metas_all[i]["event_count"] for i in proc)
    post_norm = method_config.get("post_process_norm", "none")

    # Chunks are dispatched ahead of consumption (JAX async dispatch): the
    # device crunches chunk k+1..k+PIPELINE_DEPTH while the host writes chunk
    # k's files. Depth bounds device memory for long sequences. Per-chunk
    # tunnel round-trip latency (~100s of ms on axon) is hidden this way.
    #
    # Event buffers come from a rotated pool (see the batched runner for the
    # sizing argument): fresh per-chunk allocations cost a page fault per
    # touched page on this 1-core host.
    n_chunks = -(-len(proc) // chunk_t) if proc else 0
    n_pools = min(PIPELINE_DEPTH, max(n_chunks, 1)) + 1
    from evreal_tpu.data.packing import wire_dtypes, wire_format

    dtypes = wire_dtypes(wire_format(),
                         np.issubdtype(seq.xy.dtype, np.integer),
                         seq.sensor_resolution)
    from evreal_tpu.data.packing import alloc_buffers

    buf_pool = [alloc_buffers((chunk_t,), capacity, dtypes)
                for _ in range(n_pools)]

    # Metric arrays always span the full compiled chunk_t (refs zero-padded,
    # score tails ignored on host) so the jitted metric program compiles
    # exactly once per sequence — a ragged final chunk would otherwise force
    # a second multi-minute compile on this chip, and metrics with large
    # embedded constants (MANIQA) would double their constant memory.
    def pad_refs_t(r):
        if r is None or r.shape[0] == chunk_t:
            return r
        out = np.zeros((chunk_t,) + r.shape[1:], r.dtype)
        out[: r.shape[0]] = r
        return out

    # GT frames cross the tunnel as raw uint8 when the memmap stores u8
    # (runner.derefs converts on device, bit-identical to frame()); the
    # host-side float32 stack is only materialized for hist-eq configs,
    # which equalize the refs on host before scoring.
    frame_u8 = getattr(seq, "frame_u8", lambda i: None)

    def stack_refs(metas):
        u8 = [frame_u8(m["frame_index"]) for m in metas]
        if all(r is not None for r in u8):
            return np.stack(u8)
        return np.stack([seq.frame(m["frame_index"]) for m in metas])

    live, probe_metrics, fetch_scores, dropped = make_metric_containment(
        runner, "sequence")

    def pack_chunk(ci, c0):
        chunk = proc[c0:c0 + chunk_t]
        valid_t = len(chunk)
        chunk_max = max(metas_all[i]["event_count"] for i in chunk)
        if chunk_max <= capacity:
            cap_c, zeroed = capacity, False
            views = {key: arr[:valid_t]
                     for key, arr in buf_pool[ci % n_pools].items()}
        else:
            # outlier chunk (rare by plan_capacity construction): escalate
            # to its own bucket with one-off buffers instead of inflating
            # every pool for the whole sequence
            cap_c, views = outlier_buffers((valid_t,), chunk_max, dtypes)
            zeroed = True
        buffers, metas = pack_windows(seq, chunk, capacity=cap_c,
                                      out=views, out_zeroed=zeroed,
                                      metas=[metas_all[i] for i in chunk])
        if valid_t < chunk_t:  # pad last chunk to the compiled T
            for key in buffers:
                buffers[key] = (np.pad(buffers[key], (0, chunk_t - valid_t))
                                if key == "count" else
                                np.pad(buffers[key],
                                       ((0, chunk_t - valid_t), (0, 0))))
        return chunk, metas, buffers

    # upload-ahead staging: device_put every chunk (events + padded metric
    # refs) while the process is still in its fast pre-compute H2D state,
    # so the chunk loop below dispatches from HBM (harness/staging.py;
    # budget-bounded — on exhaustion the remaining chunks stream as before)
    staged = {}
    if proc and staging.active():
        staging.preload_metric_params(specs)
        want_refs = (seq.has_images and not color and hist_eq == "none"
                     and bool(specs))
        for ci, c0 in enumerate(range(0, len(proc), chunk_t)):
            chunk, metas, buffers = pack_chunk(ci, c0)
            tree = {"bufs": buffers}
            if want_refs:
                tree["refs"] = pad_refs_t(stack_refs(metas))
            dev = staging.stage(tree)
            if dev is None:
                break  # budget exhausted; the rest streams per chunk
            staged[ci] = dev

    state = runner.init_state()

    def drain(entry):
        chunk, metas, tensors, refs, entry_use = entry
        if color:
            cimgs, gimgs = tensors
            valid_t = len(chunk)
            merged = runner.merge_host(np.asarray(cimgs)[:valid_t],
                                       np.asarray(gimgs)[:valid_t])
            for j, (i, meta) in enumerate(zip(chunk, metas)):
                img = post_process_normalization_np(merged[j], post_norm)
                # the reference hist-equalizes color frames too and saves
                # them under _processed (eval_metrics.py:260-266)
                proc = (histeq_mod.histogram_equalization(
                    np.clip(img, 0, 1), hist_eq)
                    if hist_eq != "none" else None)
                tracker.update(i, img, None, meta["voxel_timestamp"],
                               meta["frame_timestamp"] if seq.has_images
                               else None, scores=None, processed_img=proc)
                rate = (0 if meta["event_count"] <= 1 or meta["dt"] == 0
                        else meta["event_count"] / meta["dt"])
                tracker.save_custom_metric(i, "event_rate", rate)
            return
        from evreal_tpu.utils import bounded_fetch

        images_dev, clipped_dev, scores_dev, refs_dev = tensors
        valid_t = len(chunk)
        # u8 frames (quantized on device) or None when save_images is off;
        # bounded-slice fetch (a single big np.asarray can wedge the
        # backend's transfer path, CLAUDE.md), sliced to the valid rows ON
        # DEVICE first — a ragged final chunk's padding frames are pure
        # dead D2H bytes on the ~45 MB/s tunnel
        images = (bounded_fetch(images_dev[:valid_t])
                  if images_dev is not None else None)
        if hist_eq != "none":
            # the clipped tensor is only needed on host for hist-eq; the
            # tracker re-clips `images` itself, so the std path skips this
            # device->host transfer entirely
            clipped_np = bounded_fetch(clipped_dev[:valid_t])
            proc_imgs = np.stack([histeq_mod.histogram_equalization(im,
                                                                    hist_eq)
                                  for im in clipped_np])
            proc_refs = (np.stack([histeq_mod.histogram_equalization(
                np.clip(r, 0, 1), hist_eq) for r in refs])
                if refs is not None else None)
            scores = {}
            use = live(specs if refs is not None
                       else [s for s in specs if s.no_ref])
            if use:
                pi = jnp.asarray(pad_refs_t(proc_imgs))
                pr = (jnp.asarray(pad_refs_t(proc_refs))
                      if proc_refs is not None else jnp.zeros_like(pi))
                try:
                    scores = fetch_scores(runner.metric_scores(use, pi, pr),
                                          use, pi, pr)
                except Exception:  # noqa: BLE001 — sync-backend failure
                    scores = probe_metrics(use, pi, pr)
        else:
            proc_imgs = None  # tracker clips `images` itself
            scores = (fetch_scores(scores_dev, entry_use, clipped_dev,
                                   refs_dev)
                      if scores_dev else {})
        for j, (i, meta) in enumerate(zip(chunk, metas)):
            frame_scores = {k: v[j] for k, v in scores.items()}
            tracker.update(
                i, images[j] if images is not None else None,
                refs[j] if refs is not None else None,
                meta["voxel_timestamp"],
                meta["frame_timestamp"] if seq.has_images else None,
                scores=frame_scores,
                processed_img=proc_imgs[j] if hist_eq != "none" else None)
            rate = (0 if meta["event_count"] <= 1 or meta["dt"] == 0
                    else meta["event_count"] / meta["dt"])
            tracker.save_custom_metric(i, "event_rate", rate)

    pending = []
    timer = DeviceTimer(method_name, frames=max(len(proc), 1))
    timer.__enter__()
    for ci, c0 in enumerate(range(0, len(proc), chunk_t)):
        staged_refs = None
        if ci in staged:
            chunk = proc[c0:c0 + chunk_t]
            valid_t = len(chunk)
            metas = [metas_all[i] for i in chunk]
            dev = staged.pop(ci)
            buffers, staged_refs = dev["bufs"], dev.get("refs")
        else:
            chunk, metas, buffers = pack_chunk(ci, c0)
            valid_t = len(chunk)

        # host-side float32 refs only exist for hist-eq configs (equalized
        # on host before scoring); the std path uploads uint8 via
        # stack_refs and the tracker never reads ref pixel data
        refs_any = seq.has_images and not color
        refs = None
        if refs_any and hist_eq != "none":
            refs = np.stack([seq.frame(m["frame_index"]) for m in metas])

        if color:
            state, cimgs, gimgs = runner.run(state, buffers)
            entry = (chunk, metas, (cimgs, gimgs), None, None)
        else:
            state, images, clipped = runner.run(state, buffers)
            # device-quantized u8 frames: 4x fewer D2H bytes, and no image
            # fetch at all when nothing will be saved
            images = (runner.quantize_u8(images) if tracker.save_images
                      else None)
            scores_dev = None
            refs_dev = None
            use = live(specs if refs_any
                       else [s for s in specs if s.no_ref])
            if use and hist_eq == "none":
                if staged_refs is not None:
                    refs_dev = staged_refs
                elif refs_any:
                    refs_dev = jnp.asarray(pad_refs_t(stack_refs(metas)))
                else:
                    refs_dev = jnp.zeros_like(clipped)
                if refs_dev.dtype == jnp.uint8:
                    refs_dev = derefs(refs_dev)
                try:
                    scores_dev = runner.metric_scores(use, clipped,
                                                      refs_dev)
                except Exception:  # noqa: BLE001 — on a synchronous
                    # backend the runtime failure surfaces at the call
                    scores_dev = probe_metrics(use, clipped, refs_dev)
            entry = (chunk, metas, (images, clipped, scores_dev, refs_dev),
                     refs, use)
        pending.append(entry)
        if ci == 0 and len(proc) > chunk_t:
            # first chunk bears the jit compiles (model program at run();
            # metric program at metric_scores() — which for hist-eq configs
            # happens inside drain()); complete it fully, then restart the
            # timer so the recorded sample is steady-state ms/frame,
            # comparable to the reference's per-forward CudaTimer numbers
            if hist_eq != "none" and not color:
                drain(pending.pop(0))  # metric program compiles here
            try:
                fence((state, entry[2]))
            except Exception:  # noqa: BLE001 — a failing host-callback
                pass           # metric is contained at drain time instead
            timer.exclude_warmup(valid_t)
        if len(pending) >= PIPELINE_DEPTH:
            drain(pending.pop(0))
    for entry in pending:
        drain(entry)
    if proc:
        # value-fetch fence, not block_until_ready: the timing boundary
        # must be trustworthy (CLAUDE.md; fence docstring above)
        fence((state,))
    timer.__exit__()

    tracker.finalize(proc[-1] if proc else 0, dropped=dropped)
    if eval_config.get("create_video", False):
        tracker.create_video()
        if hist_eq != "none":
            tracker.create_processed_video()
    return tracker.get_num_quan_evaluations(), tracker.get_mean_scores()


# ---------------------------------------------------------------------------
# method bundle: params + per-resolution runners
# ---------------------------------------------------------------------------

class MethodBundle:
    def __init__(self, method_name, method_config):
        self.method_name = method_name
        self.method_config = method_config
        params, meta = load_method_params(method_config)
        self.params = params
        self.model = build_from_meta(meta)
        self._runners = {}

    def runner_for(self, sensor_resolution, method_config, num_bins):
        key = tuple(sensor_resolution)
        if key not in self._runners:
            h, w = sensor_resolution
            self._runners[key] = MethodRunner(
                self.model, self.params,
                event_norm=method_config.get("event_tensor_normalization",
                                             False),
                post_norm=method_config.get("post_process_norm", "none"),
                height=h, width=w, num_bins=num_bins)
        return self._runners[key]

    def batched_runner_for(self, sensor_resolution, method_config, num_bins,
                           n):
        from evreal_tpu.harness.batched import BatchedRunner, get_eval_mesh

        key = ("batched", n) + tuple(sensor_resolution)
        if key not in self._runners:
            h, w = sensor_resolution
            self._runners[key] = BatchedRunner(
                self.model, self.params,
                event_norm=method_config.get("event_tensor_normalization",
                                             False),
                post_norm=method_config.get("post_process_norm", "none"),
                height=h, width=w, num_bins=num_bins, n=n,
                mesh=get_eval_mesh())
        return self._runners[key]

    def color_runner_for(self, sensor_resolution, method_config, num_bins):
        from evreal_tpu.models.colornet import ColorRunner
        key = ("color",) + tuple(sensor_resolution)
        if key not in self._runners:
            h, w = sensor_resolution
            vox = resolve_voxelize_fn(default_voxelize_impl())
            stage = make_voxel_stage(
                vox, num_bins, (h, w),
                method_config.get("event_tensor_normalization", False))
            self._runners[key] = ColorRunner(self.model, self.params,
                                             h, w, stage)
        return self._runners[key]


# ---------------------------------------------------------------------------
# top-level loops (reference eval.py:333-455)
# ---------------------------------------------------------------------------

def accumulate_mean_scores(dataset_metrics, results):
    """Fold per-sequence ``(num_evaluated, mean_scores)`` into the dataset
    tracker, skipping the tracker's -1 no-result sentinel (metric dropped
    by containment, or zero finite scores). Deliberate divergence: the
    reference blends -1 into the dataset average with positive weight
    (eval.py:259-266 combined with the -1 of eval_metrics.py:66-70),
    silently corrupting the printed table whenever one sequence records no
    scores for a metric."""
    for num_eval, mean_scores in results:
        for metric_name, score in mean_scores.items():
            if score == -1:
                continue
            dataset_metrics.update(metric_name, score, num_eval)


def eval_method_with_config(eval_config, method_name, datasets, metrics):
    num_sequences = sum(len(d["sequences"]) for d in datasets)
    method_config = get_method_config(method_name)
    print(color_progress("Starting method " + method_name))
    method_metrics = []
    try:
        bundle = MethodBundle(method_name, method_config)
    except Exception as e:  # noqa: BLE001 — containment, reference eval.py:344-352
        print(color_error(f"Exception while getting method {method_name}"))
        print(color_error(str(e)))
        print(color_error(traceback.format_exc()))
        return method_metrics

    color = eval_config.get("color", False)
    batched_ok = (not color
                  and os.environ.get("EVREAL_BATCHED", "1") != "0")
    seq_no = 1
    for dataset in datasets:
        dataset_metrics = None
        try:
            dataset_metrics = MetricTracker()
            # group same-resolution sequences for lockstep batched eval
            groups = []
            if batched_ok:
                by_res = OrderedDict()
                for sequence in dataset["sequences"]:
                    key = tuple(sequence["dataset"].sensor_resolution)
                    by_res.setdefault(key, []).append(sequence)
                groups = split_groups(list(by_res.values()),
                                      DEFAULT_BATCH_N)
            else:
                groups = [[s] for s in dataset["sequences"]]

            for group in groups:
                for sequence in group:
                    print(color_progress(
                        f"Evaluating {method_name} method with "
                        f"{eval_config['name']} evaluation config on "
                        f"{sequence['name']} sequence from {dataset['name']} "
                        f"dataset. ({seq_no}/{num_sequences} for this method "
                        f"and config)"))
                    seq_no += 1
                if len(group) > 1:
                    from evreal_tpu.harness.batched import (
                        eval_method_on_sequence_group)

                    results = eval_method_on_sequence_group(
                        dataset["name"], eval_config, method_name, bundle,
                        method_config, group, metrics)
                else:
                    results = [eval_method_on_sequence(
                        dataset["name"], eval_config, method_name, bundle,
                        method_config, group[0], metrics)]
                accumulate_mean_scores(dataset_metrics, results)
        except Exception as e:  # noqa: BLE001 — containment, eval.py:369-375
            print(color_error(f"Exception while evaluating method "
                              f"{method_name} on {dataset['name']} dataset:"))
            print(color_error(str(e)))
            print(color_error(traceback.format_exc()))
        finally:
            if dataset_metrics:
                method_metrics.append(dataset_metrics)
    return method_metrics


def get_eval_info_str(eval_config, method_names, dataset_configs):
    if len(method_names) > 1:
        methods_str = "methods " + method_names[0]
        for m in method_names[1:-1]:
            methods_str += ", " + m
        methods_str += " and " + method_names[-1]
    else:
        methods_str = "method " + method_names[0]
    if len(dataset_configs) > 1:
        datasets_str = dataset_configs[0]["name"]
        for d in dataset_configs[1:-1]:
            datasets_str += ", " + d["name"]
        datasets_str += " and " + dataset_configs[-1]["name"] + " datasets"
    else:
        datasets_str = dataset_configs[0]["name"] + " dataset"
    return ("evaluating " + methods_str + " on " + datasets_str + " with " +
            eval_config["name"] + " evaluation config")


def evaluate(method_names=None, eval_config_names=None, dataset_names=None,
             metrics=None):
    """Drop-in equivalent of the reference ``evaluate`` (eval.py:413-444).

    Set ``EVREAL_PROFILE=<dir>`` to capture a jax.profiler trace of the whole
    run (the TPU analogue of the reference's CudaTimer instrumentation)."""
    import contextlib

    profile_dir = os.environ.get("EVREAL_PROFILE")
    ctx = (jax.profiler.trace(profile_dir) if profile_dir
           else contextlib.nullcontext())
    with ctx:
        return _evaluate(method_names, eval_config_names, dataset_names,
                         metrics)


def _evaluate(method_names=None, eval_config_names=None, dataset_names=None,
              metrics=None):
    # a malformed EVREAL_WIRE must fail fast, not degrade every dataset to
    # a printed traceback inside the per-dataset containment (same pattern
    # as the EVREAL_BATCH_N parse at import)
    from evreal_tpu.data.packing import wire_format

    wire_format()
    if method_names is None:
        method_names = ["E2VID", "E2VID+", "FireNet", "FireNet+",
                        "SPADE-E2VID", "SSL-E2VID", "ET-Net", "HyperE2VID"]
    if eval_config_names is None:
        eval_config_names = ["std"]
    if dataset_names is None:
        dataset_names = ["ECD", "MVSEC", "HQF"]
    if metrics is None:
        metrics = ["mse", "ssim", "lpips"]
    eval_configs = get_eval_configs(eval_config_names)
    dataset_configs = get_dataset_configs(dataset_names)
    for eval_config in eval_configs:
        dataset_kwargs = eval_config.get("dataset_kwargs", {})
        datasets = get_datasets(dataset_configs, dataset_kwargs)
        info = get_eval_info_str(eval_config, method_names, dataset_configs)
        print(color_progress("Started " + info))
        config_all_metrics = []
        for method_name in method_names:
            config_all_metrics.append(
                eval_method_with_config(eval_config, method_name, datasets,
                                        metrics))
        print(color_progress("Finished " + info))
        names = [d["name"] for d in datasets]
        print_scores(config_all_metrics, method_names, names,
                     eval_config["name"])
