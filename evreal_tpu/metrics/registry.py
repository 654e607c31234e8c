"""Metric plugin registry — the counterpart of the reference's dynamic
pyiqa factory (utils/eval_metrics.py:100-159): any registered name becomes
usable via ``eval.py -qm <name>``.

A metric is a jittable function over 2-D float images in [0, 1]:

    full-reference:  fn(img, ref) -> scalar
    no-reference:    fn(img) -> scalar        (no_ref=True)

The harness vmaps it over frame chunks on device. Register via::

    from evreal_tpu.metrics.registry import register
    register("mymetric", my_fn, no_ref=False)

A metric with large weights passes ``params`` — a zero-arg callable
returning a host pytree, loaded lazily once per process. Its fn then takes
the pytree as leading argument (``fn(params, img[, ref])``) and the harness
feeds the weights through the jit boundary as runtime *arguments*. Weights
captured by closure would instead inline into the HLO as constants —
measured fatal for MANIQA's ~400 MB ViT-B/8: the axon remote-compile
endpoint rejects the program body (HTTP 413), and every compiled variant
would duplicate the constants on device.

Built-ins: mse, ssim, plus lpips/niqe/brisque/maniqa when their converted
weights exist (weights/README.md). Any other requested name falls back to
the pyiqa escape hatch (pyiqa_bridge) when pyiqa is importable, matching
the reference's runtime PyIqaMetricFactory.
"""

import dataclasses

import numpy as np


@dataclasses.dataclass
class MetricSpec:
    name: str
    fn: object  # jittable callable
    no_ref: bool = False
    # serial=True: evaluate frames with lax.map instead of vmap — for
    # metrics whose per-frame memory is large (MANIQA's 20-crop ViT-B/8
    # would need ~19 GB of attention activations vmapped over a 32-frame
    # chunk; mapped it peaks at one frame's ~0.6 GB)
    serial: bool = False
    # zero-arg callable -> host pytree of weights; when set, fn's signature
    # grows a leading params argument (see module docstring)
    params: object = None
    _loaded: object = dataclasses.field(default=None, repr=False)

    def loaded(self):
        """Memoized weights as device arrays (one HBM copy per process)."""
        if self.params is not None and self._loaded is None:
            import jax
            import jax.numpy as jnp

            self._loaded = jax.tree_util.tree_map(jnp.asarray, self.params())
        return self._loaded

    def bound(self):
        """fn with loaded weights pre-bound (for standalone use; the
        harness passes them through the jit boundary instead)."""
        if self.params is None:
            return self.fn
        loaded = self.loaded()
        return lambda *a: self.fn(loaded, *a)


_REGISTRY = {}


def register(name, fn, no_ref=False, serial=False, params=None):
    _REGISTRY[name.lower()] = MetricSpec(name.lower(), fn, no_ref, serial,
                                         params)


def make_host_nr_metric(name, score_fn, min_side=None):
    """Jittable wrapper for a host-side (numpy) no-reference metric,
    shared by niqe/brisque: a pure_callback whose per-frame failures score
    NaN (dropped by the tracker's NaN filtering, reference
    eval_metrics.py:51) instead of raising — the fixed-shape pipeline also
    scores the zero-padded tail of a ragged final chunk, whose frames can
    be all-NaN after robust normalization, and a raise there would kill
    the metric for the whole sequence. ``min_side`` turns a SYSTEMATIC
    failure (every frame too small for the metric's patch size) into a
    loud trace-time error instead of an all-NaN column with one stdout
    line — frame shapes are static at trace time."""
    warned = []

    def fn(img):
        import jax

        if min_side is not None and min(img.shape[-2:]) < min_side:
            raise ValueError(
                f"{name} needs frames >= {min_side} px per side, got "
                f"{tuple(img.shape[-2:])} — every frame of this sequence "
                f"would fail")

        def host(im):
            try:
                return np.float32(score_fn(np.asarray(im)))
            except Exception as exc:  # noqa: BLE001
                if not warned:
                    warned.append(True)
                    print(f"{name} failed on a frame ({exc}); scoring NaN")
                return np.float32("nan")

        # vmap_method: the harness always vmaps metric fns over the chunk
        # (runner.metric_scores); host feature extraction is serial anyway
        return jax.pure_callback(host, np.zeros((), np.float32), img,
                                 vmap_method="sequential")

    return fn


def names():
    _ensure_builtins()
    return sorted(_REGISTRY)


def resolve(metric_names):
    """Map requested names to specs; prints the reference's messages for
    unknown/unavailable metrics and returns the usable specs in order."""
    _ensure_builtins()
    specs = []
    gated = {"lpips": "tools/convert_lpips.py",
             "maniqa": "tools/convert_maniqa.py",
             "niqe": "tools/convert_niqe.py",
             "brisque": "tools/convert_brisque.py"}
    for m in metric_names:
        key = m.lower()
        if key in gated and key not in _REGISTRY:
            if key in ("niqe", "brisque") and _nr_import_error is not None:
                print(f"{key} unavailable: {_nr_import_error} "
                      f"(scipy is required); skipping {key}")
            else:
                print(f"{key} weights unavailable (see {gated[key]}); "
                      f"skipping {key}")
            continue
        spec = _REGISTRY.get(key)
        if spec is None:
            spec = _try_pyiqa(key)
        if spec is None:
            print(f"Unknown metric {m}")
            continue
        specs.append(spec)
    return specs


def _try_pyiqa(key):
    """Escape hatch (reference eval_metrics.py:100-159): any
    ``pyiqa.list_models()`` name becomes a host-callback metric when pyiqa
    is importable. Created specs are registered so repeat resolves (and the
    tracker's name lookups) reuse the same instance, like the reference's
    ``created_metrics`` cache."""
    from evreal_tpu.metrics.pyiqa_bridge import make_pyiqa_spec

    made = make_pyiqa_spec(key)
    if made is None:
        return None
    fn, no_ref = made
    register(key, fn, no_ref=no_ref)
    return _REGISTRY[key]


_builtins_done = False
_nr_import_error = None


def _ensure_builtins():
    global _builtins_done
    if _builtins_done:
        return
    _builtins_done = True
    from evreal_tpu.metrics import functional as F
    from evreal_tpu.metrics import lpips as lpips_mod

    register("mse", F.mse)
    register("ssim", F.ssim)
    if lpips_mod.weights_available():
        register("lpips",
                 lambda w, img, ref: lpips_mod.lpips(w, img, ref)[0],
                 params=lpips_mod.load_weights)
    from evreal_tpu.metrics import maniqa as maniqa_mod

    maniqa_mod.register_if_available()
    global _nr_import_error
    try:
        from evreal_tpu.metrics import brisque as brisque_mod
        from evreal_tpu.metrics import niqe as niqe_mod
    except ImportError as e:  # scipy missing: NR metrics unavailable
        _nr_import_error = e
        return
    niqe_mod.register_if_available()
    brisque_mod.register_if_available()
