"""Driver-level hermeticity check for ``__graft_entry__.dryrun_multichip``.

Round 1's driver invocation failed (MULTICHIP_r01.json rc=1) because the
dryrun initialized the default (axon TPU) backend before any CPU fallback
and relied on the caller to set ``--xla_force_host_platform_device_count``.
This test reproduces the driver's calling convention in a fresh subprocess
with NO XLA_FLAGS / JAX_PLATFORMS help from the environment — with the axon
plugin still importable — and asserts the dryrun passes on its own.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_compiles_and_runs():
    """The driver's single-chip contract: entry() returns a jittable fn
    plus example args; it must compile and execute (CPU here — the test
    conftest pins jax_default_device)."""
    import jax
    import numpy as np

    import __graft_entry__ as g

    fn, args = g.entry()
    img, state = jax.jit(fn)(*args)
    assert img.shape[0] == 1 and img.ndim == 4
    assert np.isfinite(np.asarray(img)).all()
    # recurrent: a second step with the returned state must also run
    img2, _ = jax.jit(fn)(args[0], state, args[2])
    assert img2.shape == img.shape


@pytest.mark.slow
def test_dryrun_multichip_hermetic():
    env = dict(os.environ)
    # Simulate a bare driver environment: no virtual-device or platform help.
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "dryrun_multichip(8): ok" in proc.stdout, proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_survives_preinitialized_backend():
    """If the caller's process already initialized a jax backend (so the
    virtual-device flag can't take effect), the dryrun must re-exec itself
    hermetically instead of failing."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    code = ("import jax; jax.devices('cpu'); "  # backend init, 1 CPU device
            "import __graft_entry__ as g; g.dryrun_multichip(8)")
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "dryrun_multichip(8): ok" in proc.stdout, proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_survives_wedged_accelerator_env():
    """With an accelerator plugin environment present (JAX_PLATFORMS=axon
    + PALLAS_AXON_POOL_IPS set — the driver's real env), the dryrun must
    still pass: it re-execs with the plugin's registration gate unset and
    JAX_PLATFORMS=cpu, so a dead/wedged tunnel can never hang client init
    (observed live: relay death hung every jax.devices() for hours)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    env.setdefault("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "dryrun_multichip(8): ok" in proc.stdout, proc.stdout
