"""The `python -m kid_tpu` entry: case listing and an end-to-end run
with the NetCDF sink and checkpoint/resume (the reference's
namelist-driven KiD shell equivalent)."""
from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(*argv, timeout=600):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    return subprocess.run([sys.executable, "-m", "kid_tpu", *argv],
                          cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=timeout)


def test_cli_list():
    out = _cli("list")
    assert out.returncode == 0, out.stderr[-2000:]
    for name in ("warm1", "mixed1", "aerosol1d", "cumulus2d"):
        assert name in out.stdout
    assert "published-spec" in out.stdout     # provenance shown


def test_cli_run_netcdf_and_resume(tmp_path):
    nc_path = str(tmp_path / "d.nc")
    ck = str(tmp_path / "ck")
    out = _cli("run", "warm1_recon", "--steps", "12", "--platform",
               "cpu", "--profiles", "qc,qr", "--out", nc_path,
               "--checkpoint-dir", ck)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    from scipy.io import netcdf_file
    with netcdf_file(nc_path, "r", mmap=False) as nc:
        assert nc.variables["qc"].shape[0] == 12
        assert "total_surface_ppt" in nc.variables
    out2 = _cli("run", "warm1_recon", "--steps", "24", "--platform",
                "cpu", "--profiles", "qc", "--checkpoint-dir", ck,
                "--resume")
    assert out2.returncode == 0, out2.stdout[-2000:] + out2.stderr[-2000:]
    assert "resumed from checkpoint step 12" in out2.stdout
