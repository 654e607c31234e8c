"""Shared utilities (color merge, pure-Python rosbag, compile cache)."""

import os

# One device->host fetch must stay small on this backend: ~10 MB per-chunk
# fetches are the practical ceiling, and a single 256 MB np.asarray crawled
# at ~0.66 MB/s and wedged the transfer path for ~15 min (CLAUDE.md).
FETCH_BYTES = 8 * 1024 * 1024


def bounded_fetch(dev, max_bytes=FETCH_BYTES):
    """Device->host fetch in slices of at most ``max_bytes``, recursing
    into leading axes when a single leading-axis item is itself too large
    (e.g. (lanes, chunk_t, H, W) batched-eval tensors at big sensors).
    Returns a writable np.ndarray (``np.asarray`` of a jax array is a
    read-only view, and callers reasonably draw overlays in place)."""
    import numpy as np

    nbytes = getattr(dev, "nbytes", 0)
    if getattr(dev, "ndim", 0) == 0 or nbytes <= max_bytes:
        return np.array(dev)
    n0 = dev.shape[0]
    item = nbytes // max(n0, 1)
    if item > max_bytes and dev.ndim > 1:
        return np.stack([bounded_fetch(dev[i], max_bytes)
                         for i in range(n0)])
    per = max(1, int(max_bytes // max(item, 1)))
    return np.concatenate([np.asarray(dev[i:i + per])
                           for i in range(0, n0, per)])


def enable_compile_cache():
    """Best-effort persistent XLA compilation cache (compiles of these
    programs have been observed taking minutes when the chip is degraded;
    bench.py, tools/bench_methods.py and __graft_entry__.py share one cache
    through this helper)."""
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.cache/evreal_jax")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass
