"""Driver-artifact regression tests for ``__graft_entry__``.

Round-1 MULTICHIP failed because ``dryrun_multichip`` asserted on the device
count instead of bootstrapping a virtual CPU mesh (VERDICT.md item 1).  These
tests pin the fix: the respawn path must succeed from a process that sees a
single device, exactly like the driver's.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_respawns_from_single_device():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import sys; sys.path.insert(0, %r)\n"
        "import __graft_entry__ as g\n"
        "assert len(jax.devices()) == 1\n"
        "g.dryrun_multichip(8)\n" % REPO
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8): ok" in proc.stdout


def test_dryrun_inline_when_devices_available():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
