"""Driver-contract test: __graft_entry__.dryrun_multichip must work in a
FRESH process without tests/conftest.py forcing the platform.

Round-1 post-mortem (VERDICT.md): the dryrun ran on the pinned single-chip
axon TPU platform and died; the fix is platform selection inside
dryrun_multichip itself. This test reproduces the driver's invocation:
a bare subprocess, no pytest, no conftest, repo root on sys.path.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_fresh_subprocess():
    # Scrub the variables conftest sets so the subprocess matches the
    # driver environment as closely as possible.
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1500,  # cold CPU compile of the full step is ~7 min on 1 core
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip failed rc={proc.returncode}\n"
        f"stdout tail: {proc.stdout[-2000:]}\n"
        f"stderr tail: {proc.stderr[-2000:]}"
    )
    assert "dryrun_multichip ok" in proc.stdout


def test_make_mesh_refuses_to_truncate():
    import jax

    from adaptsegnet_tpu.parallel import make_mesh
    import pytest

    with pytest.raises(ValueError, match="requested"):
        make_mesh(len(jax.devices()) + 1)
