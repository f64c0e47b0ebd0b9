"""The driver-facing contract: dryrun_multichip must self-provision.

Round-1 regression: ``MULTICHIP_r01.json`` was red because the function
assumed the caller had already forced the virtual CPU mesh. The driver runs
it in a fresh process where the machine-level axon sitecustomize pins JAX to
the 1-device TPU tunnel — so the function itself must set
``XLA_FLAGS=--xla_force_host_platform_device_count=<n>`` and force the CPU
platform before any jax device query.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_self_provisions():
    env = dict(os.environ)
    # Simulate the driver: no pre-set virtual device count, and a platform
    # pin that would route to a 1-device backend if not overridden.
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(4)"],
        env=env, capture_output=True, text=True, timeout=560)
    assert out.returncode == 0, out.stderr
    assert "dryrun_multichip(4) OK" in out.stdout, out.stdout
