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


def test_bench_main_smoke_cpu():
    """The full bench main() flow — staged pre-compute upload, probes,
    resident measurement, prestaged headline, streamed fallback — must run
    end-to-end and print one JSON line with the contract keys. Tiny shapes
    via the EVREAL_BENCH_* overrides, diagnostics legs skipped, on CPU
    (the driver runs the real shapes on the chip)."""
    import json
    import os

    env = dict(os.environ)
    # skip axon plugin discovery entirely (it ignores JAX_PLATFORMS)
    env["PYTHONPATH"] = "/root/repo"
    env["JAX_PLATFORMS"] = "cpu"
    env.update({"EVREAL_BENCH_B": "2", "EVREAL_BENCH_T": "2",
                "EVREAL_BENCH_H": "32", "EVREAL_BENCH_W": "48",
                "EVREAL_BENCH_CAP": "256", "EVREAL_BENCH_DIAG": "0",
                "EVREAL_BENCH_TINY_PROBES": "1",
                "EVREAL_SCAN_UNROLL": "1",
                "EVREAL_BENCH_WAIT_S": "0"})
    proc = subprocess.run([sys.executable, "bench.py"], cwd="/root/repo",
                          capture_output=True, text=True, timeout=420,
                          env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    # overridden shapes must self-describe, not masquerade as the
    # b16 ECD headline (ADVICE r03)
    assert out["metric"] == "e2vid_recon_fps_32x48_b2_t2"
    assert (out["batch_n"], out["chunk_t"]) == (2, 2)
    # the headline is the better of the two supported ingestion patterns
    assert out["mode"] in ("prestaged", "streamed")
    for key in ("value", "vs_baseline", "device_resident_fps",
                "streamed_fps", "probe_tflops", "probe_h2d_gbps",
                "throttled"):
        assert key in out, key
    assert out["value"] > 0
    candidates = [out["streamed_fps"]]
    if "prestaged_fps" in out:  # present iff the canary passed
        assert "staged_upload_s" in out
        # prestaged can never exceed the compute-only rate it amortizes
        # the staging upload into
        assert out["prestaged_fps"] <= out["device_resident_fps"] + 1e-6
        candidates.append(out["prestaged_fps"])
    assert out["value"] == max(candidates)


def test_bench_main_streamed_fallback_cpu():
    """With prestaging disabled (EVREAL_PRESTAGE=0 — what a collapsed
    pre-compute canary also produces), the bench must still emit a valid
    headline in streamed mode with no prestage keys."""
    import json
    import os

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env["JAX_PLATFORMS"] = "cpu"
    env.update({"EVREAL_BENCH_B": "2", "EVREAL_BENCH_T": "2",
                "EVREAL_BENCH_H": "32", "EVREAL_BENCH_W": "48",
                "EVREAL_BENCH_CAP": "256", "EVREAL_BENCH_DIAG": "0",
                "EVREAL_BENCH_TINY_PROBES": "1",
                "EVREAL_SCAN_UNROLL": "1",
                "EVREAL_BENCH_WAIT_S": "0",
                "EVREAL_PRESTAGE": "0"})
    proc = subprocess.run([sys.executable, "bench.py"], cwd="/root/repo",
                          capture_output=True, text=True, timeout=420,
                          env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["mode"] == "streamed"
    assert out["value"] == out["streamed_fps"] > 0
    assert "prestaged_fps" not in out and "staged_upload_s" not in out


def test_sick_classifier():
    """Missing probe keys are unclassifiable and count as sick (retrying
    can only help); a fully healthy probe dict is not sick; throttle and
    host contention each flip it — but the op-latency (dispatch) axis
    does NOT: the lockstep headline is insensitive to it and it degrades
    for hours, so retrying on it would burn driver wall-clock for
    nothing."""
    import bench

    assert bench._sick({})
    healthy = {"throttled": False, "op_latency_degraded": False,
               "host_contended": False}
    assert not bench._sick(healthy)
    for axis in ("throttled", "host_contended"):
        assert bench._sick({**healthy, axis: True}), axis
    assert not bench._sick({**healthy, "op_latency_degraded": True})


def test_retry_phase_always_reemits_final_line(capsys, monkeypatch):
    """r04 post-mortem: the retry phase may never cost the artifact. Even
    when the budget is too small for a single probe, it must end by
    re-emitting the winning JSON line with retry provenance as the final
    stdout line (the driver parses the tail)."""
    import json

    import bench

    monkeypatch.setenv("EVREAL_BENCH_WAIT_S", "1")
    first = {"metric": "m", "value": 1.0, "unit": "frames/s",
             "backend": "tpu", "throttled": True}
    bench.retry_for_healthy_window(first)
    lines = capsys.readouterr().out.strip().splitlines()
    out = json.loads(lines[-1])
    assert out["value"] == 1.0
    assert out["retry_result"] == "no_healthy_window"
    assert "retry_waited_s" in out


def test_retry_phase_skips_non_tpu_and_healthy(capsys, monkeypatch):
    """No retry chatter on CPU smoke runs or healthy captures."""
    import bench

    monkeypatch.setenv("EVREAL_BENCH_WAIT_S", "600")
    bench.retry_for_healthy_window({"value": 1.0, "backend": "cpu",
                                    "throttled": True})
    bench.retry_for_healthy_window({"value": 1.0, "backend": "tpu",
                                    "throttled": False,
                                    "op_latency_degraded": False})
    assert capsys.readouterr().out == ""


def test_probe_subprocess_failure_is_recorded():
    """A failed probe subprocess must say WHY (r04 printed `{}` for a
    probe that itself died, indistinguishable from a throttle)."""
    import bench

    out = bench._run_probe_subprocess(0.2)  # cannot even start jax in time
    assert "probe_error" in out
    assert "timed out" in out["probe_error"]


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
