"""Driver-contract tests for __graft_entry__.py.

The driver invokes ``dryrun_multichip(n)`` in a process where JAX is already
initialised on the single real chip (round-1 failure: MULTICHIP_r01.json
rc=1). The function must therefore self-provision its own n-device virtual
CPU platform. This test reproduces the driver environment in a subprocess:
JAX initialised with ONE device (no --xla_force_host_platform_device_count),
then dryrun_multichip(8) is called and must succeed.
"""

import pytest

pytestmark = pytest.mark.slow  # multi-minute on the 1-core host (see CLAUDE.md test lanes)

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_self_provisions_single_device_process():
    env = dict(os.environ)
    # Strip the virtual-mesh flag the test conftest injects, so the outer
    # process genuinely has one device — like the driver's.
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (REPO, env.get("PYTHONPATH", "")) if p
    )
    child = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert jax.device_count() == 1, jax.device_count()\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", child], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=2400,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip(8)" in proc.stdout
    assert "dp+tp train step OK" in proc.stdout


def test_dryrun_multichip_in_process_on_virtual_mesh():
    # Under the test conftest this process already has 8 CPU devices, so the
    # in-process fast path runs.
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
