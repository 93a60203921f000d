"""f32/TPU validation of the PRODUCTION 2-D path (VERDICT r4 next #4).

Runs cumulus2d and orographic2d at full size and case length through the
production configuration — float32, the fused Pallas kernel (TPU
default), ``driver.loop.simulate`` — plus cumulus2d through
``dist.mesh.simulate_sharded`` on the real device mesh, and scores each
against the saved full-size fp64-driver anchors (validate_2d.py, itself
twin-validated at nx=16 against the literal transliteration).

Pass rule: the SAME fixed integrated-quantity budgets as the 1-D f32
validation (validate_cases_f32.py — cumulative domain precip, final
water paths, time-mean profiles) plus the water-budget closure staying
within the documented non-conservation budget.  Writes the
``f32_tpu_2d`` block of VALIDATION_r05.json.

Usage:  python validate_2d_f32.py [cpu|tpu]     (default tpu)
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax

BACKEND = sys.argv[1] if len(sys.argv) > 1 else "tpu"
if BACKEND == "cpu":
    jax.config.update("jax_platforms", "cpu")
assert not jax.config.read("jax_enable_x64")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/kid_tpu_xla")
                  if BACKEND == "tpu" else "/root/.cache/jax_comp")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kid_tpu.dist.mesh import make_mesh, simulate_sharded  # noqa: E402
from kid_tpu.driver.cases import CUMULUS2D, OROGRAPHIC2D  # noqa: E402
from kid_tpu.driver.loop import KidState, initial_state, simulate  # noqa: E402
from kid_tpu.micro.solver import device_tables  # noqa: E402
from kid_tpu.tables.cache import get_tables  # noqa: E402
from validate_2d import CONS_TOL, WATER_FIELDS  # noqa: E402
from validate_cases import (FINALS_DIR, OUT, TARGET_FIELDS,  # noqa: E402
                            integrated_scores, score_against_oracle)
from validate_cases_f32 import (F32_BUDGET, PATH_BUDGET,  # noqa: E402
                                PPT_BUDGET, PPT_BUDGET_DEFAULT,
                                TMEAN_BUDGET)


def run_one(case, sharded: bool):
    n = case.n_steps
    tables = device_tables(get_tables(iiwarm=case.micro.iiwarm),
                           jnp.float32)
    st = initial_state(case, jnp.float32)
    if sharded:
        mesh = make_mesh(len(jax.devices()))
        final, streams = simulate_sharded(st, tables, case, n, mesh,
                                          profile_diags=KidState._fields)
    else:
        final, streams = simulate(st, tables, case, n,
                                  profile_diags=KidState._fields)
    return st, final, streams


def closure(case, st0, final, streams):
    grid = case.grid()
    wz = grid.rho0 * grid.dz

    def water(d):
        q = sum(np.asarray(d[f], np.float64) for f in WATER_FIELDS)
        return float((q * wz[None, :]).sum())

    w0 = water({f: getattr(st0, f) for f in WATER_FIELDS})
    wf = water({f: getattr(final, f) for f in WATER_FIELDS})
    ppt = float(sum(np.asarray(getattr(streams, k), np.float64).sum()
                    for k in ("ppt_rain", "ppt_snow", "ppt_graupel",
                              "ppt_ice")))
    return (w0 - wf - ppt) / w0


def main():
    report = json.load(open(OUT)) if os.path.exists(OUT) else {}
    key = "f32_tpu_2d" if BACKEND == "tpu" else "f32_cpu_2d"
    report[key] = {"pass_budgets": {
                       "cum_ppt_rel": PPT_BUDGET_DEFAULT,
                       "final_water_path_rel": PATH_BUDGET,
                       "tmean_prof_rel": TMEAN_BUDGET,
                       "closure": CONS_TOL},
                   "jax_backend": jax.default_backend(),
                   "cases": {}}
    jobs = [(CUMULUS2D, False), (OROGRAPHIC2D, False), (CUMULUS2D, True)]
    for case, sharded in jobs:
        path = os.path.join(FINALS_DIR, f"{case.name}_2dfp64.npz")
        if not os.path.exists(path):
            print(f"skip {case.name}: no 2-D fp64 anchors (run "
                  "validate_2d.py first)", flush=True)
            continue
        oracle = np.load(path)
        t0 = time.time()
        st0, final, streams = run_one(case, sharded)
        entry = score_against_oracle(
            {f: np.asarray(getattr(final, f)) for f in final._fields},
            np.asarray(streams.ppt_rain, np.float64).sum(axis=1),
            oracle, F32_BUDGET, F32_BUDGET)
        tmean = {f: np.asarray(streams.profiles[f], np.float64)
                 .mean(axis=0) for f in final._fields}
        entry.update(integrated_scores(
            {f: np.asarray(getattr(final, f)) for f in final._fields},
            oracle, case, tmean_driver=tmean))
        entry["closure"] = closure(case, st0, final, streams)
        entry["pass"] = bool(
            entry["cum_ppt_rain_rel"] <= PPT_BUDGET.get(
                case.name, PPT_BUDGET_DEFAULT)
            and entry["final_wvp_rel"] <= PATH_BUDGET
            and entry["final_lwp_rel"] <= PATH_BUDGET
            and entry["final_iwp_rel"] <= PATH_BUDGET
            and entry["tmean_prof_worst_rel"] <= TMEAN_BUDGET
            and abs(entry["closure"]) <= CONS_TOL)
        entry["n_steps"] = case.n_steps
        entry["sharded"] = sharded
        entry["seconds"] = round(time.time() - t0, 1)
        name = case.name + ("_sharded" if sharded else "")
        report[key]["cases"][name] = entry
        print(f"[{key}] {name}: ppt={entry['cum_ppt_rain_rel']:.3e} "
              f"tmean={entry['tmean_prof_worst_rel']:.3e} "
              f"closure={entry['closure']:.3e} "
              f"worst_field={entry['worst_target_field_rel']:.3e} "
              f"pass={entry['pass']} ({entry['seconds']}s)", flush=True)
    report[f"{key}_all_pass"] = all(
        v["pass"] for v in report[key]["cases"].values())
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({f"{key}_all_pass": report[f"{key}_all_pass"]}))


if __name__ == "__main__":
    main()
