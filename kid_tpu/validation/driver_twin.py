"""Driver-level oracle twin: the KiD time loop with the oracle microphysics.

Replays EXACTLY the per-step contract of ``driver.loop.make_step`` — the
same prescribed-flow advection tendencies (reusing the driver's own jnp
advection functions in fp64), the same provisional state
``x + (adv + div)*dt`` (mphys_thompson09n.f90:60-93), the same theta/T/
pressure mapping (:60-61) — but advances the microphysics with the literal
NumPy fp64 transliteration ``mp_thompson_oracle`` instead of the JAX
solver.  Comparing ``driver.loop.simulate`` against this twin therefore
isolates the column-solver difference over a FULL case, the integration-
level equivalence target of SURVEY.md §4.2 (allclose on the prognostics
the wrapper round-trips, mphys_thompson09n.f90:198-245, plus the surface-
precip series, :155-192).

Supports 1-D cases and (round 4) the 2-D cases: for nx > 1 the twin adds
the same periodic-padded stream-function x-advection the driver uses
(driver/advection.py) and loops every column through the oracle — the
correctness anchor the 2-D cases previously lacked (they were only ever
checked sharded-vs-single-device against themselves).
"""
from __future__ import annotations

import numpy as np

from .. import constants as c
from ..driver.advection import (advective_tendency_x_padded,
                                advective_tendency_z,
                                divergence_tendency_z)
from ..driver.cases import Case
from ..driver.loop import KidState, initial_state
from .oracle import mp_thompson_oracle


def oracle_simulate(case: Case, n_steps: int, tables_host,
                    want_means: bool = False):
    """Run ``n_steps`` of a case with oracle microphysics.

    Returns (final KidState-like dict of (nx, nz) float64 arrays,
    dict of per-step surface precip series shaped (n_steps,) for 1-D
    cases and (n_steps, nx) for 2-D cases).  With ``want_means`` also
    returns the per-field TIME-MEAN (nx, nz) profiles over the run —
    the integrated yardstick the f32 validation budgets read
    (validate_cases_f32.py)."""
    import jax
    if not jax.config.read("jax_enable_x64"):
        raise RuntimeError("oracle twin requires jax_enable_x64 for the "
                           "advection tendencies to be fp64-exact")
    import jax.numpy as jnp

    grid = case.grid()
    cfg = case.micro
    dt = case.dt
    nx, nz = case.nx, case.nz
    one_d = case.is_1d
    exner = np.asarray(grid.exner, np.float64)
    pres = np.asarray(grid.pres, np.float64)
    rho0 = np.asarray(grid.rho0, np.float64)
    dz = np.asarray(grid.dz, np.float64)
    rho_face = np.concatenate([rho0[:1], 0.5 * (rho0[1:] + rho0[:-1]),
                               rho0[-1:]])
    w_pat = np.asarray(case.rhow_pattern(grid), np.float64)   # (nx, nz+1)
    u_pat = (None if one_d
             else np.asarray(case.rhou_pattern(grid), np.float64))
    dzq = np.broadcast_to(dz, (nz,))

    st0 = initial_state(case, jnp.float64)
    fields = {f: np.asarray(getattr(st0, f), np.float64).copy()
              for f in KidState._fields}

    shape = (n_steps,) if one_d else (n_steps, nx)
    ppt = {k: np.zeros(shape) for k in ("rain", "snow", "graupel", "ice")}
    mean_acc = {f: np.zeros((nx, nz)) for f in KidState._fields}

    rho0_j = jnp.asarray(rho0)
    dz_j = jnp.asarray(dz)
    w_pat_j = jnp.asarray(w_pat)
    u_pat_j = None if one_d else jnp.asarray(u_pat)

    from ..driver.loop import advected_fields
    adv_fields = advected_fields(cfg)    # same static rule as the driver

    for istep in range(n_steps):
        t = istep * dt
        m = float(np.asarray(case.time_modulation(t)))
        w_face = m * w_pat_j                                 # (nx, nz+1)

        q = jnp.asarray(np.stack([fields[f] for f in adv_fields]))
        ten = advective_tendency_z(q, w_face, rho0_j, dz_j)
        if one_d:
            ten = ten + divergence_tendency_z(q, w_face, rho0_j, dz_j)
        else:
            u_face = case.u0 * rho0_j[None, :] + m * u_pat_j
            qpad = jnp.concatenate([q[:, -2:], q, q[:, :2]], axis=1)
            ten = ten + advective_tendency_x_padded(qpad, u_face, rho0_j,
                                                    case.dx)
        ten = np.asarray(ten, np.float64)
        prov = dict(fields)
        for i, f in enumerate(adv_fields):
            prov[f] = fields[f] + ten[i] * dt

        w_vel = np.asarray(w_face, np.float64) / rho_face    # (nx, nz+1)
        w_cent = 0.5 * (w_vel[:, 1:] + w_vel[:, :-1])

        new = {f: np.empty((nx, nz)) for f in KidState._fields}
        for i in range(nx):
            t_p = prov["theta"][i] * exner
            out = mp_thompson_oracle(
                prov["qv"][i], prov["qc"][i], prov["qi"][i], prov["qr"][i],
                prov["qs"][i], prov["qg"][i], prov["ni"][i], prov["nr"][i],
                prov["nc"][i], prov["nwfa"][i], prov["nifa"][i],
                t_p, pres, w_cent[i], dzq, dt, tables_host,
                iiwarm=cfg.iiwarm, l_sediment=cfg.l_sediment,
                set_nc=cfg.set_nc, is_aerosol_aware=cfg.is_aerosol_aware,
                ifdry=1 if cfg.ifdry else 0, dusty_ice=cfg.dusty_ice,
                homog_ice=cfg.homog_ice)
            new["theta"][i] = out["t1d"] / exner
            for f, k in (("qv", "qv1d"), ("qc", "qc1d"), ("qr", "qr1d"),
                         ("nr", "nr1d"), ("qi", "qi1d"), ("ni", "ni1d"),
                         ("qs", "qs1d"), ("qg", "qg1d"), ("nc", "nc1d"),
                         ("nwfa", "nwfa1d"), ("nifa", "nifa1d")):
                new[f][i] = np.asarray(out[k], np.float64)
            loc = istep if one_d else (istep, i)
            ppt["rain"][loc] = out["pptrain"]
            ppt["snow"][loc] = out["pptsnow"]
            ppt["graupel"][loc] = out["pptgraul"]
            ppt["ice"][loc] = out["pptice"]
        fields = new
        for f in KidState._fields:
            mean_acc[f] += new[f]

    if want_means:
        means = {f: a / max(n_steps, 1) for f, a in mean_acc.items()}
        return fields, ppt, means
    return fields, ppt
