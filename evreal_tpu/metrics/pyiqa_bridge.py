"""Escape hatch for arbitrary pyiqa metrics (reference
utils/eval_metrics.py:100-159, PyIqaMetricFactory): when ``import pyiqa``
succeeds, any name in ``pyiqa.list_models()`` requested via ``-qm`` becomes
a usable metric, evaluated on host through ``jax.pure_callback``.

The reference queues frames and runs pyiqa in batches of 4; here the
callback is registered with ``vmap_method="expand_dims"`` so the harness's
chunk-level vmap hands the host one batched ``(T, H, W)`` call per chunk —
the whole chunk is a single pyiqa forward, and the device pipeline stays
async around it. The host fn accepts any number of leading batch dims
(each vmap level adds one): zero for the trace probe, one in the
single-sequence runner, two under the batched group runner's (N, T)
double vmap. Grayscale [0, 1] frames are repeated to 3 channels exactly
like the reference's ``cv2torch(img, num_ch=3)``.

pyiqa is absent in minimal installs; ``make_pyiqa_spec`` then returns None
and the registry's warn-skip behavior is unchanged. A runtime failure
inside pyiqa surfaces through the callback and is contained per-metric by
the harness like any other metric failure.
"""

import warnings


def _host_batch_fn(metric, no_ref):
    import numpy as np

    def host_batch(*arrays):
        import torch

        # accept any number of leading batch dims: zero for the unbatched
        # trace-probe call, one under the sequence runner's chunk vmap,
        # two under the batched group runner's (N, T) double vmap
        # (each vmap level adds one under vmap_method="expand_dims")
        imgs = np.asarray(arrays[0], np.float32)
        lead = imgs.shape[:-2]
        flat = imgs.reshape((-1,) + imgs.shape[-2:])
        rflat = None
        if not no_ref:
            refs = np.asarray(arrays[1], np.float32)
            rflat = refs.reshape((-1,) + refs.shape[-2:])
        # mini-batch like the reference's queue-of-4 (eval_metrics.py:
        # 119-133): the group runner's double vmap flattens N*T frames
        # here, and one unbounded torch forward of a deep metric over
        # 100s of frames can OOM the 1-core host process — not contained
        # as a per-metric drop
        outs = []
        step = 4
        with torch.no_grad():
            for i in range(0, flat.shape[0], step):
                t = torch.from_numpy(
                    np.repeat(flat[i:i + step, None], 3, axis=1))
                if no_ref:
                    score = metric(t)
                else:
                    score = metric(t, torch.from_numpy(
                        np.repeat(rflat[i:i + step, None], 3, axis=1)))
                outs.append(np.asarray(score.detach().cpu(),
                                       np.float32).reshape(-1))
        out = (np.concatenate(outs) if outs
               else np.zeros((0,), np.float32))
        return out.reshape(lead)

    return host_batch


def make_pyiqa_spec(name):
    """Build a registry-compatible (fn, no_ref) for a pyiqa model name.

    Returns None when pyiqa is unavailable or does not know ``name`` —
    the caller then falls through to the unknown-metric message.
    """
    try:
        import pyiqa
    except ImportError:
        return None
    if name not in pyiqa.list_models():
        return None
    try:
        with warnings.catch_warnings():
            warnings.filterwarnings("ignore", category=UserWarning)
            metric = pyiqa.create_metric(name)
    except Exception as e:  # noqa: BLE001 — e.g. offline weight download
        # Containment contract: one broken metric is warn-skipped, it must
        # not take down the dataset eval (and every healthy metric with
        # it). create_metric commonly fails off-network — pyiqa downloads
        # pretrained weights on first use.
        print(f"[metrics] pyiqa metric {name!r} failed to construct "
              f"({type(e).__name__}: {e}); skipping")
        return None
    no_ref = getattr(metric, "metric_mode", "FR") == "NR"
    host_batch = _host_batch_fn(metric, no_ref)

    import jax
    import jax.numpy as jnp

    def _call(*args):
        return jax.pure_callback(host_batch,
                                 jax.ShapeDtypeStruct((), jnp.float32),
                                 *args, vmap_method="expand_dims")

    if no_ref:
        def fn(img):
            return _call(img)
    else:
        def fn(img, ref):
            return _call(img, ref)
    return fn, no_ref
