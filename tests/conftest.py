"""Test configuration: force an 8-device virtual CPU platform so sharding
tests run without TPU hardware, per the multi-chip dry-run contract.

The axon TPU plugin ignores ``JAX_PLATFORMS=cpu``, so we also pin
``jax_default_device`` to a CPU device after import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# The shipped scan-unroll default (4) only buys speed on the real chip; on
# this 1-core host it multiplies scan-body compile time across the whole
# suite. Pin 1 here — tests/test_scan_unroll.py proves unroll is a pure
# scheduling knob (bit-identical), so coverage is unchanged.
os.environ.setdefault("EVREAL_SCAN_UNROLL", "1")

import jax  # noqa: E402

if jax.default_backend() != "cpu":
    jax.config.update("jax_default_device", jax.devices("cpu")[0])


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end test")
