"""bench.py helpers that must not interfere with a healthy run."""

import subprocess
import sys
import time


def test_backend_guard_cancel_path():
    """Once cancelled, the guard must never fire — a healthy bench run
    continues past the init window untouched."""
    import bench

    done = bench._backend_guard(0.2)
    done.set()
    time.sleep(0.5)  # were the timer still armed, os._exit would fire here
    assert True


def test_op_latency_probe_runs():
    """The op-latency probe (small-op dispatch axis) must execute on any
    backend and return a sane per-iteration time."""
    import bench

    us = bench.op_latency_probe(repeats=1)
    assert 0.0 < us < 1e6


def test_host_load_probe():
    """Every bench capture stamps the host state it was taken in: on this
    1-core host a concurrent process inflates the op-latency probe >10x
    with the chip untouched, so the JSON must let a reader discount it."""
    import bench

    info = bench.host_load_probe()
    assert info["host_cpus"] >= 1
    if "host_load_1m" in info:  # getloadavg available (Linux: always)
        assert info["host_load_1m"] >= 0.0
        assert info["host_contended"] == (
            info["host_load_1m"] / info["host_cpus"] > 1.5)


def test_backend_guard_fires_in_subprocess():
    """Un-cancelled, the guard prints the error JSON and exits 3 — the
    driver records a self-describing artifact instead of hanging."""
    code = (
        "import bench, time\n"
        "bench._backend_guard(0.2)\n"
        "time.sleep(10)\n"
    )
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-c", code], cwd="/root/repo",
                          capture_output=True, text=True, timeout=30)
    assert proc.returncode == 3
    assert time.time() - t0 < 10
    assert "backend unreachable" in proc.stdout
    assert proc.stdout.strip().startswith("{")
