"""Full-length case equivalence: JAX driver vs the oracle-driven twin.

Drives the five 1-D cases — warm1 (published SH2012 profile; 3,600
steps), warm1_recon (the former reconstruction, 3,600), mixed1 (1,800),
deep1 (1,800; the per-species CFL-substep stress case of BASELINE
config 3) and aerosol1d (900) — through BOTH
``driver.loop.simulate`` (fp64) and the oracle twin
(``validation/driver_twin.oracle_simulate``), then compares the
prognostics the reference wrapper round-trips
(mphys_thompson09n.f90:198-245) and the cumulative surface-precip series
(:155-192).  Writes ``VALIDATION_r04.json`` with per-field max relative
errors and pass/fail at rtol 1e-4 (the SURVEY §4.2 accuracy target;
relative to the twin's own field scale so empty fields don't divide by
zero), and saves each oracle final state + precip series to
``validation_finals/<case>.npz`` so the f32 PRODUCTION-path runs
(``validate_cases_f32.py`` — a separate process with x64 disabled, on
CPU inline XLA and on the TPU fused-Pallas default) can be scored
against the same fp64 arbiter.

Usage:  python validate_cases.py            # fp64 rows + oracle finals
        python validate_cases_f32.py        # f32 rows (run per backend)
"""
from __future__ import annotations

import json
import os
import time

import jax

def _configure():
    # fp64 oracle comparison is a CPU job; never let it grab the TPU
    # tunnel.  NOTE: this image's sitecustomize imports jax at interpreter
    # start, so the JAX_PLATFORMS env var is already consumed — use
    # jax.config instead.  Called from main() ONLY: validate_cases_f32.py
    # imports this module for its helpers and must NOT have x64 flipped on
    # by a module-level side effect (that was a real round-4 bug).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

import numpy as np  # noqa: E402

from kid_tpu.driver.cases import (AEROSOL1D, DEEP1, MIXED1, WARM1,  # noqa: E402
                                  WARM1_RECON)
from kid_tpu.driver.loop import run_case  # noqa: E402
from kid_tpu.tables.cache import get_tables  # noqa: E402
from kid_tpu.validation.driver_twin import oracle_simulate  # noqa: E402

RTOL = 1e-4
OUT = "VALIDATION_r05.json"
FINALS_DIR = "validation_finals"
# nc/nwfa/nifa are NOT part of the reference accuracy target (BASELINE.md
# lists qv,qc,qr,qi,qs,qg,ni,nr,theta — the fields the KiD wrapper
# round-trips, mphys_thompson09n.f90:198-245).  They are this framework's
# beyond-reference aerosol prognostics; in the aerosol case their
# activation<->evaporation feedback accumulates divergence faster, so they
# get a documented looser budget.
TARGET_FIELDS = ("theta", "qv", "qc", "qr", "nr", "qi", "ni", "qs", "qg")
RTOL_AEROSOL_EXTRAS = 1e-3
RUNS = [(WARM1, 3600), (WARM1_RECON, 3600), (MIXED1, 1800),
        (DEEP1, 1800), (AEROSOL1D, 900)]


def score_against_oracle(final_fields, ppt_rain_series, oracle_npz,
                         rtol, rtol_extras):
    """Per-field max rel errors of a driver run vs saved oracle finals."""
    entry = {"fields": {}}
    worst_target, worst_extra = 0.0, 0.0
    for f, a in final_fields.items():
        b = oracle_npz[f]
        scale = np.abs(b).max() + 1e-30
        rel = float(np.abs(np.asarray(a, np.float64) - b).max() / scale)
        entry["fields"][f] = rel
        if f in TARGET_FIELDS:
            worst_target = max(worst_target, rel)
        else:
            worst_extra = max(worst_extra, rel)
    pj = np.asarray(ppt_rain_series, np.float64).cumsum()
    po = oracle_npz["ppt_rain"].cumsum()
    ppt_rel = float(np.abs(pj - po).max() / (np.abs(po).max() + 1e-30))
    entry["cum_ppt_rain_rel"] = ppt_rel
    entry["worst_target_field_rel"] = worst_target
    entry["worst_aerosol_extra_rel"] = worst_extra
    entry["pass"] = bool(worst_target <= rtol and ppt_rel <= rtol
                         and worst_extra <= rtol_extras)
    return entry


def integrated_scores(final_fields, oracle_npz, case, tmean_driver=None):
    """Budgets on the INTEGRATED, physically-read quantities of the KiD
    intercomparison (VERDICT r4 next #3): final column water paths
    (vapor / liquid / ice, rho0-weighted vertical integrals) and the
    time-mean profiles, each relative to the oracle's own scale."""
    grid = case.grid()
    wz = grid.rho0 * grid.dz                      # (nz,) column weights

    def path(fields, keys):
        return sum((np.asarray(fields[k], np.float64) * wz).sum(-1)
                   for k in keys)

    entry = {}
    for name, keys in (("wvp", ("qv",)), ("lwp", ("qc", "qr")),
                       ("iwp", ("qi", "qs", "qg"))):
        po = path(oracle_npz, keys)
        pd = path(final_fields, keys)
        scale = np.abs(po).max() + np.abs(path(oracle_npz, ("qv",))).max() \
            * 1e-6 + 1e-30      # floor tiny ice paths against the vapor path
        entry[f"final_{name}_rel"] = float(np.abs(pd - po).max() / scale)
    if tmean_driver is not None and "tmean_qv" in oracle_npz:
        worst = 0.0
        for f in TARGET_FIELDS:
            a = np.asarray(tmean_driver[f], np.float64)
            b = np.asarray(oracle_npz[f"tmean_{f}"], np.float64)
            worst = max(worst, float(np.abs(a - b).max()
                                     / (np.abs(b).max() + 1e-30)))
        entry["tmean_prof_worst_rel"] = worst
    return entry


def run_ref_precision_model(case, n):
    """The reference's own precision design — fp32 STATE with fp64
    process arithmetic (module_mp_thompson09n.f90:1181-1213) — emulated
    by running the fp64 driver with the scan carry rounded to f32 every
    step.  Its deviation from the pure-fp64 oracle twin is the intrinsic
    state-precision sensitivity of the case, and the yardstick the
    full-f32 production path is judged against (validate_cases_f32.py).
    """
    import jax.numpy as jnp
    from jax import lax

    from kid_tpu.driver.loop import (KidState, _unpack_streams,
                                     initial_state, make_step)
    from kid_tpu.micro.solver import device_tables
    from kid_tpu.tables.cache import get_tables

    grid = case.grid()
    tables = device_tables(get_tables(iiwarm=case.micro.iiwarm),
                           jnp.float64)
    pres2 = jnp.broadcast_to(jnp.asarray(grid.pres, jnp.float64),
                             (case.nx, case.nz))
    w_pat = jnp.asarray(case.rhow_pattern(grid), jnp.float64)
    step = make_step(case, tables, jnp.float64, w_pat, None, pres2, None,
                     ())

    def step_rounded(st, i):
        new, outs = step(st, i)
        new = KidState(*[x.astype(jnp.float32).astype(jnp.float64)
                         for x in new])
        return new, outs

    @jax.jit
    def run(st0):
        return lax.scan(step_rounded, st0, jnp.arange(n))

    final, raw = run(initial_state(case, jnp.float64))
    return final, _unpack_streams(raw)


def main():
    _configure()
    os.makedirs(FINALS_DIR, exist_ok=True)
    report = json.load(open(OUT)) if os.path.exists(OUT) else {}
    report.setdefault("fp64", {})
    import jax.numpy as jnp

    from kid_tpu.driver.loop import initial_state, simulate
    from kid_tpu.micro.solver import device_tables

    for case, n in RUNS:
        t0 = time.time()
        tables = get_tables(iiwarm=case.micro.iiwarm)
        final, streams = run_case(case, n_steps=n)
        fo, ppt, means_o = oracle_simulate(case, n, tables,
                                           want_means=True)
        np.savez(os.path.join(FINALS_DIR, f"{case.name}.npz"),
                 ppt_rain=ppt["rain"],
                 **{f: fo[f] for f in final._fields},
                 **{f"tmean_{f}": means_o[f] for f in final._fields})
        entry = score_against_oracle(
            {f: np.asarray(getattr(final, f)) for f in final._fields},
            np.asarray(streams.ppt_rain)[:, 0],
            {**{f: fo[f] for f in final._fields}, "ppt_rain": ppt["rain"]},
            RTOL, RTOL_AEROSOL_EXTRAS)
        entry["n_steps"] = n
        # intrinsic trajectory sensitivity at case length: the SAME fp64
        # program from a 1e-7-perturbed qv — the yardstick the f32
        # production-path rows are judged against (an f32 rounding is a
        # ~1e-7-class perturbation per step; if f32-vs-oracle divergence
        # is comparable to this, it is chaos-dominated, not a numerics
        # bug)
        tb64 = device_tables(tables, jnp.float64)
        st0p = initial_state(case, jnp.float64)
        st0p = st0p._replace(qv=st0p.qv * (1.0 + 1.0e-7))
        finalp, streamsp = simulate(st0p, tb64, case, n)
        pent = score_against_oracle(
            {f: np.asarray(getattr(finalp, f)) for f in finalp._fields},
            np.asarray(streamsp.ppt_rain)[:, 0],
            {**{f: fo[f] for f in final._fields}, "ppt_rain": ppt["rain"]},
            RTOL, RTOL_AEROSOL_EXTRAS)
        entry["perturbed_1em7_worst_target_rel"] = \
            pent["worst_target_field_rel"]
        entry["perturbed_1em7_cum_ppt_rel"] = pent["cum_ppt_rain_rel"]
        # the reference's own precision model (f32 state + fp64 rates)
        finalr, streamsr = run_ref_precision_model(case, n)
        rent = score_against_oracle(
            {f: np.asarray(getattr(finalr, f)) for f in finalr._fields},
            np.asarray(streamsr.ppt_rain)[:, 0],
            {**{f: fo[f] for f in final._fields}, "ppt_rain": ppt["rain"]},
            RTOL, RTOL_AEROSOL_EXTRAS)
        entry["ref_precision_model_worst_target_rel"] = \
            rent["worst_target_field_rel"]
        entry["ref_precision_model_cum_ppt_rel"] = rent["cum_ppt_rain_rel"]
        # the reference model's own integrated-quantity deviations — the
        # measurements the f32 pass budgets are fixed against
        # (validate_cases_f32.py docstring); e.g. deep1 final_lwp lands
        # at 5.5e-2 under the reference's own f32-state design (the
        # melting-front level shift), so the full-f32 path cannot be
        # held to a tighter final-path budget there
        rint = integrated_scores(
            {f: np.asarray(getattr(finalr, f)) for f in finalr._fields},
            {**{f: fo[f] for f in final._fields}}, case)
        for k, v in rint.items():
            entry[f"ref_precision_model_{k}"] = v
        entry["seconds"] = round(time.time() - t0, 1)
        report["fp64"][case.name] = entry
        print(f"{case.name}: worst_target_rel="
              f"{entry['worst_target_field_rel']:.3e} "
              f"worst_extra_rel={entry['worst_aerosol_extra_rel']:.3e} "
              f"cum_ppt_rel={entry['cum_ppt_rain_rel']:.3e} "
              f"pass={entry['pass']} ({entry['seconds']}s)", flush=True)
    report["rtol"] = RTOL
    report["fp64_all_pass"] = all(v["pass"] for v in report["fp64"].values())
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"fp64_all_pass": report["fp64_all_pass"]}))


if __name__ == "__main__":
    main()
