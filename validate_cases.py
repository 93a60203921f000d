"""Full-length case equivalence: JAX driver vs the oracle-driven twin.

Drives warm1 (3,600 steps), mixed1 (1,800 steps) and aerosol1d (900 steps)
through BOTH ``driver.loop.simulate`` and the oracle twin
(``validation/driver_twin.oracle_simulate``), then compares the
prognostics the reference wrapper round-trips
(mphys_thompson09n.f90:198-245) and the cumulative surface-precip series
(:155-192).  Writes ``VALIDATION_r03.json`` with per-field max relative
errors and pass/fail at rtol 1e-4 (the SURVEY §4.2 accuracy target;
relative to the twin's own field scale so empty fields don't divide by
zero).

Usage:  JAX_PLATFORMS=cpu python validate_cases.py
"""
from __future__ import annotations

import json
import os
import time

import jax

# fp64 oracle comparison is a CPU job; never let it grab the TPU tunnel.
# NOTE: this image's sitecustomize imports jax at interpreter start, so the
# JAX_PLATFORMS env var is already consumed — use jax.config instead.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_comp")

import numpy as np  # noqa: E402

from kid_tpu.driver.cases import AEROSOL1D, MIXED1, WARM1  # noqa: E402
from kid_tpu.driver.loop import run_case  # noqa: E402
from kid_tpu.tables.cache import get_tables  # noqa: E402
from kid_tpu.validation.driver_twin import oracle_simulate  # noqa: E402

RTOL = 1e-4
# nc/nwfa/nifa are NOT part of the reference accuracy target (BASELINE.md
# lists qv,qc,qr,qi,qs,qg,ni,nr,theta — the fields the KiD wrapper
# round-trips, mphys_thompson09n.f90:198-245).  They are this framework's
# beyond-reference aerosol prognostics; in the aerosol case their
# activation<->evaporation feedback accumulates divergence faster, so they
# get a documented looser budget.
TARGET_FIELDS = ("theta", "qv", "qc", "qr", "nr", "qi", "ni", "qs", "qg")
RTOL_AEROSOL_EXTRAS = 1e-3
RUNS = [(WARM1, 3600), (MIXED1, 1800), (AEROSOL1D, 900)]


def main():
    report = {}
    for case, n in RUNS:
        t0 = time.time()
        tables = get_tables(iiwarm=case.micro.iiwarm)
        final, streams = run_case(case, n_steps=n)
        fo, ppt = oracle_simulate(case, n, tables)
        entry = {"n_steps": n, "fields": {}, "seconds": None}
        worst_target, worst_extra = 0.0, 0.0
        for f in final._fields:
            a = np.asarray(getattr(final, f), np.float64)
            b = fo[f]
            scale = np.abs(b).max() + 1e-30
            rel = float(np.abs(a - b).max() / scale)
            entry["fields"][f] = rel
            if f in TARGET_FIELDS:
                worst_target = max(worst_target, rel)
            else:
                worst_extra = max(worst_extra, rel)
        pj = np.asarray(streams.ppt_rain)[:, 0].cumsum()
        po = ppt["rain"].cumsum()
        ppt_rel = float(np.abs(pj - po).max()
                        / (np.abs(po).max() + 1e-30))
        entry["cum_ppt_rain_rel"] = ppt_rel
        entry["worst_target_field_rel"] = worst_target
        entry["worst_aerosol_extra_rel"] = worst_extra
        entry["pass"] = bool(worst_target <= RTOL and ppt_rel <= RTOL
                             and worst_extra <= RTOL_AEROSOL_EXTRAS)
        entry["seconds"] = round(time.time() - t0, 1)
        report[case.name] = entry
        print(f"{case.name}: worst_target_rel={worst_target:.3e} "
              f"worst_extra_rel={worst_extra:.3e} "
              f"cum_ppt_rel={ppt_rel:.3e} pass={entry['pass']} "
              f"({entry['seconds']}s)", flush=True)
    report["rtol"] = RTOL
    report["all_pass"] = all(v["pass"] for k, v in report.items()
                             if isinstance(v, dict))
    with open("VALIDATION_r03.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"all_pass": report["all_pass"]}))


if __name__ == "__main__":
    main()
