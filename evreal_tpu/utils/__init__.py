"""Shared utilities (color merge, pure-Python rosbag, compile cache)."""

import os


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
