def evaluate(*args, **kwargs):
    """Lazy proxy to runner.evaluate (avoids metrics<->harness import cycle)."""
    from evreal_tpu.harness.runner import evaluate as _evaluate

    return _evaluate(*args, **kwargs)
