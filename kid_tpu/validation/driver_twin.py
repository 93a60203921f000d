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

1-D cases only (the KiD cases used for the accuracy target).
"""
from __future__ import annotations

import numpy as np

from .. import constants as c
from ..driver.advection import advective_tendency_z, divergence_tendency_z
from ..driver.cases import Case
from ..driver.loop import KidState, initial_state
from .oracle import mp_thompson_oracle


def oracle_simulate(case: Case, n_steps: int, tables_host):
    """Run ``n_steps`` of a 1-D case with oracle microphysics.

    Returns (final KidState-like dict of (1, nz) float64 arrays,
    dict of per-step surface precip series shaped (n_steps,)).
    """
    if case.nx != 1:
        raise NotImplementedError("oracle twin supports 1-D cases only")
    import jax
    if not jax.config.read("jax_enable_x64"):
        raise RuntimeError("oracle twin requires jax_enable_x64 for the "
                           "advection tendencies to be fp64-exact")
    import jax.numpy as jnp

    grid = case.grid()
    cfg = case.micro
    dt = case.dt
    nz = case.nz
    exner = np.asarray(grid.exner, np.float64)
    pres = np.asarray(grid.pres, np.float64)
    rho0 = np.asarray(grid.rho0, np.float64)
    dz = np.asarray(grid.dz, np.float64)
    rho_face = np.concatenate([rho0[:1], 0.5 * (rho0[1:] + rho0[:-1]),
                               rho0[-1:]])
    w_pat = np.asarray(case.rhow_pattern(grid), np.float64)   # (1, nz+1)
    dzq = np.broadcast_to(dz, (nz,))

    st0 = initial_state(case, jnp.float64)
    fields = {f: np.asarray(getattr(st0, f), np.float64).copy()
              for f in KidState._fields}

    ppt = {k: np.zeros(n_steps) for k in ("rain", "snow", "graupel", "ice")}

    rho0_j = jnp.asarray(rho0)
    dz_j = jnp.asarray(dz)

    for istep in range(n_steps):
        t = istep * dt
        m = float(np.asarray(case.time_modulation(t)))
        w_face = m * w_pat                                   # (1, nz+1)

        q = jnp.asarray(np.stack([fields[f] for f in KidState._fields]))
        ten = advective_tendency_z(q, jnp.asarray(w_face), rho0_j, dz_j)
        ten = ten + divergence_tendency_z(q, jnp.asarray(w_face), rho0_j,
                                          dz_j)
        ten = np.asarray(ten, np.float64)
        prov = {f: fields[f] + ten[i] * dt
                for i, f in enumerate(KidState._fields)}

        t_p = prov["theta"][0] * exner
        w_vel = w_face[0] / rho_face
        w_cent = 0.5 * (w_vel[1:] + w_vel[:-1])

        out = mp_thompson_oracle(
            prov["qv"][0], prov["qc"][0], prov["qi"][0], prov["qr"][0],
            prov["qs"][0], prov["qg"][0], prov["ni"][0], prov["nr"][0],
            prov["nc"][0], prov["nwfa"][0], prov["nifa"][0],
            t_p, pres, w_cent, dzq, dt, tables_host,
            iiwarm=cfg.iiwarm, l_sediment=cfg.l_sediment,
            set_nc=cfg.set_nc, is_aerosol_aware=cfg.is_aerosol_aware,
            ifdry=1 if cfg.ifdry else 0, dusty_ice=cfg.dusty_ice,
            homog_ice=cfg.homog_ice)

        fields["theta"] = (out["t1d"] / exner)[None, :]
        for f, k in (("qv", "qv1d"), ("qc", "qc1d"), ("qr", "qr1d"),
                     ("nr", "nr1d"), ("qi", "qi1d"), ("ni", "ni1d"),
                     ("qs", "qs1d"), ("qg", "qg1d"), ("nc", "nc1d"),
                     ("nwfa", "nwfa1d"), ("nifa", "nifa1d")):
            fields[f] = np.asarray(out[k], np.float64)[None, :]
        ppt["rain"][istep] = out["pptrain"]
        ppt["snow"][istep] = out["pptsnow"]
        ppt["graupel"][istep] = out["pptgraul"]
        ppt["ice"][istep] = out["pptice"]

    return fields, ppt
