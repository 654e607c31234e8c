"""Upload-ahead staging: move event chunks and metric reference frames
into device memory BEFORE the first compute dispatch of the process.

Why this exists: on the tunneled TPU this framework targets, host->device
bandwidth is bimodal — ~0.5-0.7 GB/s while no program has executed yet,
collapsing permanently ~15x once ANY program (even a 128x128 matmul) has
been dispatched; idle does not recover it (CLAUDE.md "Environment
gotchas", measured 2026-08-17). The eval loops' per-chunk uploads then
cost more than the compute they feed. Staging a sequence's chunks up
front rides the fast window once and the chunk loop runs device-resident.

This is a scheduling change only: the staged arrays are byte-identical to
what the streaming path would have uploaded per chunk, so outputs are
unchanged (tests/test_staging.py asserts byte-equal txt/scores).

Tradeoffs, and why they are acceptable here:
- prestaging serializes host packing before compute instead of
  overlapping them (on a fast-H2D deployment the overlap wins; disable
  with ``EVREAL_PRESTAGE=0``);
- every staged chunk occupies HBM at once, so staging is budgeted by
  ``EVREAL_PRESTAGE_MB`` (default 4096) of device bytes per process —
  once the budget is spent the loops fall back to per-chunk streaming.

The reference has no counterpart (it feeds the GPU one window at a time,
eval.py:189-246); this is a TPU-tunnel scheduling choice.
"""

import os

_compute_seen = False
_staged_bytes = 0
_put_failed = False  # a device_put raised: stop staging for the process


def note_compute():
    """Record that a program has been dispatched (H2D is now slow, so
    further prestaging would serialize uploads for no benefit)."""
    global _compute_seen
    _compute_seen = True


def _budget_bytes():
    raw = os.environ.get("EVREAL_PRESTAGE_MB", "4096")
    try:
        return int(raw) * 1024 * 1024
    except ValueError:
        raise SystemExit(
            f"EVREAL_PRESTAGE_MB must be an integer number of MB, got "
            f"{raw!r}") from None


def active():
    """True while prestaging is worthwhile: enabled, budget left, and no
    compute dispatched yet in this process."""
    if (os.environ.get("EVREAL_PRESTAGE", "1") == "0" or _compute_seen
            or _put_failed):
        return False
    return _staged_bytes < _budget_bytes()


def stage(tree):
    """device_put a pytree of host arrays and fence it; returns the device
    tree, or None when staging is inactive or the tree would exceed the
    budget (the caller streams that chunk instead).

    Each leaf is snapshotted (np.array) before the put: the caller's
    pooled host buffers are reused a few chunks later, and on this
    backend ``block_until_ready`` has been observed returning before the
    work is done (CLAUDE.md) — while the trustworthy value-fetch fence
    would itself dispatch a program, collapsing the very pre-compute H2D
    window staging exists to ride. A private immutable source makes the
    in-flight transfer safe regardless of when it completes.
    """
    global _staged_bytes
    if not active():
        return None
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    nbytes = sum(leaf.nbytes for leaf in leaves)
    if _staged_bytes + nbytes > _budget_bytes():
        return None
    import numpy as np

    tree = jax.tree_util.tree_map(np.array, tree)
    try:
        dev = jax.tree_util.tree_map(jax.device_put, tree)
        jax.block_until_ready(dev)  # best-effort pacing only (see above)
    except Exception as e:  # noqa: BLE001 — e.g. HBM ResourceExhausted
        # Staging is an optimization; a failed put (typically HBM pressure
        # at high lane counts) must degrade to per-chunk streaming, not
        # abort the sequence. Stop staging for the rest of the process —
        # the budget heuristic has already been proven wrong for this run.
        global _put_failed
        _put_failed = True
        print(f"[staging] device_put failed ({type(e).__name__}); "
              f"falling back to per-chunk streaming")
        return None
    _staged_bytes += nbytes
    return dev


def preload_metric_params(specs):
    """Trigger the registry's memoized weight upload (MetricSpec.loaded:
    one HBM copy per process) while H2D is still fast — MANIQA/LPIPS
    weights are 10s-100s of MB and would otherwise upload at the
    collapsed rate on the first metric_scores call."""
    if not active():
        return
    for s in specs:
        if s.params is not None:
            s.loaded()
