"""Driver-contract regression tests for ``__graft_entry__.py``.

Round-1 failure mode (MULTICHIP_r01.json): the driver ran
``dryrun_multichip(8)`` in an environment where the axon TPU plugin was
on PYTHONPATH and neither ``JAX_PLATFORMS`` nor ``XLA_FLAGS`` was set;
the dryrun never pinned the CPU platform, jax initialized the
(version-skewed) remote TPU client, and the first ``device_put`` died.
This test reproduces the driver's invocation exactly: fresh subprocess,
no CPU env hints, plugin PYTHONPATH preserved.
"""

import os
import pathlib
import subprocess
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent


def test_dryrun_multichip_pins_cpu_platform():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__; __graft_entry__.dryrun_multichip(8); "
            "print('DRYRUN_OK')",
        ],
        cwd=REPO_ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DRYRUN_OK" in proc.stdout
