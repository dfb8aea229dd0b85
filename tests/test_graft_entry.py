"""Driver-context smoke tests for __graft_entry__.

The round-1 multichip artifact failed because nothing in-repo ran the driver
entry the way the driver does (fresh process, NO tests/conftest.py platform
bootstrap, axon sitecustomize active).  These tests run the entries in fresh
subprocesses with a scrubbed environment so that breakage is caught in CI.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    """Environment as the driver would present it: no conftest-era overrides."""
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTEST_CURRENT_TEST")
    }
    return env


@pytest.mark.slow
def test_dryrun_multichip_fresh_subprocess():
    """dryrun_multichip(8) must pass in a clean process (MULTICHIP artifact)."""
    r = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO,
        env=_driver_env(),
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert r.returncode == 0, f"stderr tail:\n{r.stderr[-3000:]}"
    assert "view-parallel ok" in r.stdout, r.stdout
    assert "splat-sharded ok" in r.stdout, r.stdout


def test_force_cpu_mesh_fresh_subprocess():
    """The platform bootstrap alone must yield 8 CPU devices pre-backend-init."""
    script = (
        "import __graft_entry__ as g, jax; "
        "assert g._force_cpu_mesh(8); "
        "assert jax.default_backend() == 'cpu' and len(jax.devices()) == 8; "
        "print('bootstrap ok')"
    )
    r = subprocess.run(
        [sys.executable, "-c", script],
        cwd=REPO,
        env=_driver_env(),
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, f"stderr tail:\n{r.stderr[-3000:]}"
    assert "bootstrap ok" in r.stdout
