"""Measure the active k-band widths of the three family-gather masks
(rs_on, rg_on, frz_tab) and the one-hot lookup masks over the whole
mixed1 / deep1 cases, to size a dynamic-slice band compaction of the
scattered gathers (round-5 perf lever; VERDICT r4 Next #1c).

CPU, 1 column (1-D cases are horizontally homogeneous), fp32 production
path, per-step state streams from ONE compiled simulate.  Prints
per-family: activity fraction, max / p99 / p95 band width, k range.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from kid_tpu.driver.loop import initial_state, simulate
from kid_tpu.micro.solver import device_tables, _RR1, _RS1, _RG1, _RC1
from kid_tpu import constants as c
from kid_tpu.tables.cache import get_tables


def band_stats(mask):
    """Per-step (n_steps,) tightest k-band widths of (t, nx, nz) mask."""
    act = np.any(mask, axis=1)                       # (t, nz)
    widths = np.zeros(mask.shape[0], np.int64)
    k0s, k1s = [], []
    for t in range(mask.shape[0]):
        ks = np.nonzero(act[t])[0]
        if len(ks):
            widths[t] = ks[-1] - ks[0] + 1
            k0s.append(ks[0]); k1s.append(ks[-1] + 1)
    return widths, (min(k0s) if k0s else 0), (max(k1s) if k1s else 0)


def run(case_name):
    from kid_tpu.driver.cases import CASES
    case = CASES[case_name]
    grid = case.grid()
    exner = grid.exner[None, None, :]
    rho = grid.rho0[None, None, :]
    tables = device_tables(get_tables(iiwarm=case.micro.iiwarm),
                           jnp.float32)
    st = initial_state(case, jnp.float32)
    n = case.n_steps
    _, streams = simulate(st, tables, case, n,
                          profile_diags=("theta", "qc", "qr", "qi",
                                         "qs", "qg"))
    p = {k: np.asarray(v) for k, v in streams.profiles.items()}
    temp = p["theta"] * exner
    rr = p["qr"] * rho
    rs = p["qs"] * rho
    rg = p["qg"] * rho
    rc = p["qc"] * rho
    ri = p["qi"] * rho
    t_lt_0 = temp < c.T_0
    masks = {
        "racs": (rr >= _RR1) & (rs >= _RS1),
        "racg": (rr >= _RR1) & (rg >= _RG1),
        "qrfz": t_lt_0 & (rr > _RR1),
        "qcfz": t_lt_0 & (rc > _RC1),
        "iaus": t_lt_0 & (ri > c.R1),
        "efrw": (rc > c.R1) & (rr > _RR1),
        "efsw": (rc > c.R1) & (rs > _RS1),
    }
    print(f"== {case_name} (nz={case.nz}, {n} steps) ==", flush=True)
    for k, msk in masks.items():
        w, k0, k1 = band_stats(msk)
        print(f"  {k:5s}: active {np.mean(w > 0):4.0%} of steps, "
              f"width max {w.max():3d}  p99 {np.percentile(w, 99):5.1f}  "
              f"p95 {np.percentile(w, 95):5.1f}  k range [{k0},{k1})",
              flush=True)


if __name__ == "__main__":
    for name in sys.argv[1:] or ["mixed1", "deep1"]:
        run(name)
