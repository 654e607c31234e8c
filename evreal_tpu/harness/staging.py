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

The pre-compute window is itself probed before the first real stage: the
fast-before-first-compute behavior has been observed INVERTED (2026-08-19:
pre-compute puts crawling at ~0.1 MB/s while post-compute moved the same
content at 20-100 MB/s), in which state prestaging is strictly worse than
streaming. A small timed canary upload (non-zero bytes — the tunnel elides
runs of zeros, BASELINE.md) runs once; if it exceeds _CANARY_BUDGET_S the
process falls back to per-chunk streaming. Disable the probe with
``EVREAL_PRESTAGE_CANARY=0`` (then staging trusts the window immediately).

The reference has no counterpart (it feeds the GPU one window at a time,
eval.py:189-246); this is a TPU-tunnel scheduling choice.
"""

import os

_compute_seen = False
_staged_bytes = 0
_put_failed = False  # a device_put raised: stop staging for the process
_window_slow = False  # canary said the pre-compute window is collapsed
_canary_done = False
_canary_mbps = None  # measured canary rate (MB/s), for diagnostics

# 2 MiB canary, 0.6 s budget => ~3.5 MB/s minimum window rate. The states
# observed on this tunnel are bimodal (~500-700 MB/s healthy pre-compute
# window vs ~0.1 MB/s inverted), so the threshold only needs to separate
# them; the D2H fence (~45 MB/s + ~26 ms RTT) costs ~70 ms of the budget.
_CANARY_BYTES = 2 * 1024 * 1024
_CANARY_BUDGET_S = 0.6


def _run_canary():
    """Time one small pre-compute upload (pure transfers only: a program
    dispatch here would itself close the window being probed). Sets
    _window_slow when the round-trip exceeds the budget."""
    global _canary_done, _window_slow, _canary_mbps
    if _canary_done:
        return
    _canary_done = True
    if os.environ.get("EVREAL_PRESTAGE_CANARY", "1") == "0":
        return
    import time

    import jax
    import numpy as np

    # non-zero, non-constant payload: the tunnel compresses runs of zeros
    buf = np.arange(_CANARY_BYTES, dtype=np.uint8).reshape(-1)
    t0 = time.perf_counter()
    try:
        dev = jax.device_put(buf)
        np.asarray(dev)  # D2H fetch: a trustworthy pure-transfer fence
    except Exception as e:  # noqa: BLE001 — treat a failed put as slow
        _window_slow = True
        print(f"[staging] pre-compute H2D canary failed "
              f"({type(e).__name__}); falling back to per-chunk streaming")
        return
    elapsed = time.perf_counter() - t0
    # NOTE: this is a round-trip rate (put + D2H fence + tunnel RTT), NOT
    # pure H2D bandwidth — in a healthy window the ~70 ms fetch round-trip
    # dominates the ~4 ms put, so ~27 MB/s here corresponds to the
    # documented ~500-700 MB/s H2D state; only the collapsed state
    # (~0.1 MB/s) reads anywhere near its true rate. The pass/fail budget
    # below is calibrated on the same round-trip measure.
    _canary_mbps = buf.nbytes / 1e6 / max(elapsed, 1e-9)
    if elapsed > _CANARY_BUDGET_S:
        _window_slow = True
        print(f"[staging] pre-compute H2D canary {elapsed:.1f}s for "
              f"{buf.nbytes >> 20} MiB ({_canary_mbps:.2f} MB/s) — window "
              f"collapsed; falling back to per-chunk streaming")


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
    """True while prestaging is worthwhile: enabled, budget left, no
    compute dispatched yet in this process, and the pre-compute window
    canary (run lazily on the first call) didn't find the window
    collapsed."""
    if (os.environ.get("EVREAL_PRESTAGE", "1") == "0" or _compute_seen
            or _put_failed):
        return False
    if _staged_bytes >= _budget_bytes():
        return False
    _run_canary()
    return not _window_slow


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
