"""Driver-contract regression tests for `__graft_entry__.py`.

Round-1 failure mode (VERDICT.md Weak #1): the driver calls
`dryrun_multichip(8)` from a process whose JAX is ALREADY initialized on the
single real chip, so virtual-device provisioning must happen in a subprocess
— env vars are too late in the caller. These tests replay that exact calling
convention.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_driver_replay(n: int) -> subprocess.CompletedProcess:
    # Simulate the driver: a fresh process pinned to ONE device that
    # initializes jax first, then calls dryrun_multichip(n). Forcing a
    # single CPU device reproduces the driver's single-real-chip state
    # without needing the tunneled TPU.
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1, jax.devices(); "
        "import __graft_entry__; "
        f"__graft_entry__.dryrun_multichip({n}); "
        "print('REPLAY-OK')"
    )
    return subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=1500)


@pytest.mark.slow
def test_dryrun_multichip_self_provisions_from_single_device():
    proc = _run_driver_replay(4)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "REPLAY-OK" in proc.stdout
    assert "virtual 4-device CPU mesh" in proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_direct_path_when_devices_available():
    # Inside the test env we already have 8 virtual CPU devices, so the
    # direct (no-subprocess) branch must be taken and succeed.
    import __graft_entry__
    __graft_entry__.dryrun_multichip(2)
