"""Multi-host groundwork test: the jax.distributed localhost harness
(tools/multihost_dryrun.py) — 2 processes x 2 CPU devices, global 1-D
mesh, sharded product vs dense oracle.  The TPU-pod analog of running the
reference suite under `mpirun -np 2`."""

import os
import pathlib
import subprocess
import sys

import pytest


@pytest.mark.timeout(300)
def test_multihost_dryrun():
    script = (pathlib.Path(__file__).parent.parent / "tools"
              / "multihost_dryrun.py")
    env = dict(os.environ)
    env.pop("MH_ROLE", None)
    env["MH_PORT"] = "39641"  # avoid collision with manual runs
    out = subprocess.run([sys.executable, str(script)], env=env,
                         capture_output=True, text=True, timeout=280)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "multihost dryrun [global] ok" in out.stdout
    assert "multihost dryrun [hybrid] ok" in out.stdout