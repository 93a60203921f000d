"""KiD time loop: prescribed-flow advection -> microphysics -> update.

TPU-native replacement for the absent KiD shell plus the live adapter
``mphys_thompson09_interfacen`` (mphys_thompson09n.f90:28-310).  The
adapter's contract is preserved exactly:

  * provisional state fed to microphysics is ``x + (adv + div)*dt``
    (mphys_thompson09n.f90:60-93; div tendencies are zero in these cases);
  * the KiD prognostics round-tripped through microphysics are theta, qv,
    and the hydrometeor registry {cloud: mass, rain: mass+number,
    ice: mass+number, snow: mass, graupel: mass} (:66-93, :209-243);
  * temperature <-> theta via the fixed Exner profile, pressure diagnosed
    as ``p0 * exner**(1/r_on_cp)`` (:60-61);
  * final update ``x(n+1) = x(n) + (adv + div + mphys)*dt`` telescopes to
    "microphysics output becomes the new state" because mphys is backed out
    as ``(micro_out - x)/dt - adv - div`` (:198-245).

The whole run is one ``lax.scan`` over steps; per-step outputs form the
diagnostics streams (the save_dg registry, SURVEY.md §5).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as c
from ..config import MicroConfig
from ..micro import ColumnState, batched_microphysics
from ..micro.solver import device_tables
from ..tables.cache import get_tables
from .advection import (advective_tendency_x, advective_tendency_z,
                        divergence_tendency_z)
from .cases import Case
from .grid import R_ON_CP


class KidState(NamedTuple):
    """Driver prognostics, all (nx, nz)."""

    theta: jnp.ndarray
    qv: jnp.ndarray
    qc: jnp.ndarray
    qr: jnp.ndarray
    nr: jnp.ndarray
    qi: jnp.ndarray
    ni: jnp.ndarray
    qs: jnp.ndarray
    qg: jnp.ndarray


class StepOutputs(NamedTuple):
    """Per-step diagnostic stream (scan outputs)."""

    ppt_rain: jnp.ndarray      # (nx,) surface precip this step [m-equiv]
    ppt_snow: jnp.ndarray
    ppt_graupel: jnp.ndarray
    ppt_ice: jnp.ndarray
    profiles: dict             # name -> (nx, nz) per-step profile


def initial_state(case: Case, dtype=jnp.float64) -> KidState:
    grid = case.grid()
    theta = np.broadcast_to(case.theta_init(grid.z), (case.nx, case.nz))
    qv = np.broadcast_to(case.qv_init(grid.z), (case.nx, case.nz))
    z = jnp.zeros((case.nx, case.nz), dtype)
    return KidState(
        theta=jnp.asarray(theta, dtype), qv=jnp.asarray(qv, dtype),
        qc=z, qr=z, nr=z, qi=z, ni=z, qs=z, qg=z)


def _adv_all(state: KidState, rho0, rhow_face, dz, rhou_face, dx):
    """Combined d*_adv + d*_div tendencies for every prognostic.

    1-D cases: flux-form vertical advection plus the compensating
    divergence term (the two streams the reference wrapper sums at
    mphys_thompson09n.f90:60-93).  2-D cases: the stream-function mass
    fluxes are exactly non-divergent, so the div stream is zero.
    """
    one_d = rhou_face is None

    def adv(q):
        ten = advective_tendency_z(q, rhow_face, rho0, dz)
        if one_d:
            ten = ten + divergence_tendency_z(q, rhow_face, rho0, dz)
        else:
            ten = ten + advective_tendency_x(q, rhou_face, rho0, dx)
        return ten
    return KidState(*[adv(getattr(state, f)) for f in KidState._fields])


@partial(jax.jit,
         static_argnames=("case", "n_steps", "profile_diags"))
def simulate(state0: KidState, tables, case: Case, n_steps: int,
             profile_diags: bool = False):
    """Run ``n_steps`` of the case from ``state0``; returns final state and
    per-step diagnostics."""
    grid = case.grid()
    dtype = state0.qv.dtype
    dz = jnp.asarray(grid.dz, dtype)
    rho0 = jnp.asarray(grid.rho0, dtype)
    exner = jnp.asarray(grid.exner, dtype)[None, :]
    pres = jnp.asarray(grid.pres, dtype)
    pres2 = jnp.broadcast_to(pres, (case.nx, case.nz))
    dzq2 = jnp.broadcast_to(dz, (case.nx, case.nz))
    w_pat = jnp.asarray(case.rhow_pattern(grid), dtype)
    u_pat = (jnp.asarray(case.rhou_pattern(grid), dtype)
             if case.nx > 1 else None)
    rho_face = jnp.concatenate([rho0[:1], 0.5 * (rho0[1:] + rho0[:-1]),
                                rho0[-1:]])
    dt = case.dt
    cfg = case.micro
    nt_c = cfg.nt_c

    def step(carry, istep):
        st = carry
        t = istep.astype(dtype) * dt
        m = case.time_modulation(t)
        w_face = m * w_pat                       # rho0*w at z-faces
        u_face = (case.u0 * rho0[None, :] + m * u_pat) \
            if u_pat is not None else None       # rho0*u at x-faces
        adv = _adv_all(st, rho0, w_face, dz, u_face, case.dx)

        # provisional state (x + adv*dt), mapped to the micro's T/state
        # (mphys_thompson09n.f90:60-93)
        th_p = st.theta + adv.theta * dt
        t_p = th_p * exner
        qv_p = st.qv + adv.qv * dt
        rho_p = 0.622 * pres2 / (c.R_GAS * t_p * (qv_p + 0.622))
        # deterministic micro-internal inits (mp_gt_driver pattern,
        # module_mp_thompson09n.f90:957-964; SURVEY.md quirk 2)
        w_vel = w_face / rho_face                # velocity for activ_ncloud
        w_cent = 0.5 * (w_vel[:, 1:] + w_vel[:, :-1])
        micro_in = ColumnState(
            t=t_p, qv=qv_p,
            qc=st.qc + adv.qc * dt, qi=st.qi + adv.qi * dt,
            qr=st.qr + adv.qr * dt, qs=st.qs + adv.qs * dt,
            qg=st.qg + adv.qg * dt, ni=st.ni + adv.ni * dt,
            nr=st.nr + adv.nr * dt,
            nc=nt_c / rho_p, nwfa=11.1e6 / rho_p,
            nifa=c.NA_IN1 * 0.01 / rho_p)
        out, ppt, diag = batched_microphysics(
            micro_in, pres2, w_cent, dzq2, dt, tables, cfg)

        new = KidState(
            theta=out.t / exner, qv=out.qv, qc=out.qc, qr=out.qr,
            nr=out.nr, qi=out.qi, ni=out.ni, qs=out.qs, qg=out.qg)
        profs = {}
        if profile_diags:
            profs = {"qc": out.qc, "qr": out.qr, "qi": out.qi,
                     "qs": out.qs, "qg": out.qg, "theta": new.theta,
                     "qv": out.qv,
                     "prr_wau": diag["prr_wau"],
                     "prr_rcw": diag["prr_rcw"],
                     "prv_rev": diag["prv_rev"]}
        outs = StepOutputs(ppt_rain=ppt.rain, ppt_snow=ppt.snow,
                           ppt_graupel=ppt.graupel, ppt_ice=ppt.ice,
                           profiles=profs)
        return new, outs

    final, streams = jax.lax.scan(step, state0, jnp.arange(n_steps))
    return final, streams


def run_case(case: Case, dtype=jnp.float64, n_steps=None,
             profile_diags=False):
    """Convenience host-side entry: tables + init + simulate."""
    tables = device_tables(get_tables(iiwarm=case.micro.iiwarm), dtype)
    state0 = initial_state(case, dtype)
    n = case.n_steps if n_steps is None else n_steps
    return simulate(state0, tables, case, n, profile_diags)
