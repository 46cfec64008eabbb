"""Driver-gate regression: dryrun_multichip must self-provision devices.

Round-1 verdict item #1: the driver calls ``dryrun_multichip(8)`` from an
env exposing one real chip; the hook must re-exec itself with a virtual
CPU mesh (``tests/conftest.py`` pattern) rather than raise in make_mesh.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_self_provisions_from_one_device():
    # Child sees exactly 1 CPU device (no force flag), like the driver's
    # 1-real-chip env; dryrun_multichip(8) must spawn its own 8-wide mesh.
    env = {
        k: v for k, v in os.environ.items() if not k.startswith("PALLAS_AXON")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "__graft_entry__.py"),
            "--dryrun",
            "8",
        ],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(n=8) ok" in proc.stdout
    assert "'model': 2" in proc.stdout


def test_dryrun_multichip_inline_when_devices_available():
    # conftest provisions 8 virtual devices -> runs inline, no subprocess.
    import __graft_entry__ as g

    g.dryrun_multichip(8)
