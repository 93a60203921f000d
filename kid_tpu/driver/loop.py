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
from .advection import (advective_tendency_x_padded, advective_tendency_z,
                        divergence_tendency_z)
from .cases import Case
from .grid import R_ON_CP


class KidState(NamedTuple):
    """Driver prognostics, all (nx, nz).

    nc/nwfa/nifa are carried (and advected) like every other tracer so the
    aerosol-aware mode has prognostic aerosol memory, mirroring how a real
    3-D host feeds them per-column in aerosol-aware mode
    (module_mp_thompson09n.f90:950-956) and applies the solver's nwfaten/
    nifaten tendencies (f90:2398-2408).  In the default non-aerosol mode
    the solver forces nc = Nt_c/rho internally (f90:1410); nwfa still
    drifts slowly (the solver applies the -pnc_wcd/+pnr_rev bookkeeping
    unconditionally, solver.py phases 14-15) but nothing consumes nwfa
    in that mode, so the drift is physically inert — unlike the
    reference, which re-fills nwfa per step (f90:957-964) only because
    it does not carry it."""

    theta: jnp.ndarray
    qv: jnp.ndarray
    qc: jnp.ndarray
    qr: jnp.ndarray
    nr: jnp.ndarray
    qi: jnp.ndarray
    ni: jnp.ndarray
    qs: jnp.ndarray
    qg: jnp.ndarray
    nc: jnp.ndarray
    nwfa: jnp.ndarray
    nifa: jnp.ndarray


class StepOutputs(NamedTuple):
    """Per-step diagnostic stream (the public shape returned by
    ``simulate``; per-step arrays are stacked over the leading time
    axis)."""

    ppt_rain: jnp.ndarray      # (nx,) surface precip this step [kg/m^2]
    ppt_snow: jnp.ndarray
    ppt_graupel: jnp.ndarray
    ppt_ice: jnp.ndarray
    profiles: dict             # name -> (nx, nz) per-step profile


class ScanOutputs(NamedTuple):
    """INTERNAL per-step scan carry-out: the four precip species packed
    as one (4, nx) array so the scan stacks them with ONE
    dynamic-update-slice per step instead of four (measured ~0.5 ms/step
    of update-slice traffic at (8192, 120)); ``simulate`` unpacks to the
    public StepOutputs via free slices."""

    ppt: jnp.ndarray           # (4, nx): rain, snow, graupel, ice
    profiles: dict


def _unpack_streams(raw: "ScanOutputs") -> StepOutputs:
    p = raw.ppt                # (n_steps, 4, nx)
    return StepOutputs(ppt_rain=p[:, 0], ppt_snow=p[:, 1],
                       ppt_graupel=p[:, 2], ppt_ice=p[:, 3],
                       profiles=raw.profiles)


# the wrapper's per-level microphysics-tendency back-outs
# (mphys_thompson09n.f90:198-245): (micro_out - provisional)/dt
MPHYS_TENDENCY_NAMES = (
    "dtheta_mphys", "dqv_mphys", "dqc_mphys", "dqr_mphys", "dnr_mphys",
    "dqi_mphys", "dni_mphys", "dqs_mphys", "dqg_mphys")

# the solver's 36 per-level process-rate streams
# (module_mp_thompson09n.f90:2963-3124); keys of the solver diag dict
RATE_NAMES = (
    "prr_wau", "prr_rcw", "prv_rev", "pnr_wau", "pnr_rev", "pnr_rcr",
    "pri_inu", "pri_ide", "prs_ide", "prs_sde", "prg_gde", "pri_wfz",
    "prs_scw", "prg_scw", "prg_gcw", "pri_ihm", "pri_rfz", "prs_iau",
    "prs_sci", "pri_rci", "pni_inu", "pni_ihm", "pni_wfz", "pni_rfz",
    "pni_ide", "pni_iau", "pni_sci", "pni_rci", "prr_sml", "prr_gml",
    "pnr_rcs", "pnr_rcg", "pnr_rci", "pnr_sml", "pnr_gml", "pnr_rfz")

ALL_PROFILE_NAMES = KidState._fields + RATE_NAMES + MPHYS_TENDENCY_NAMES


def resolve_profile_names(profile_diags) -> tuple:
    """Normalize the ``profile_diags`` argument to a static name tuple.

    ``False``/``()`` -> none; ``True`` -> every stream (state + 36 rates +
    mphys-tendency back-outs); a tuple of names selects a subset (bounding
    lax.scan output memory to the streams actually wanted)."""
    if profile_diags is True:
        return ALL_PROFILE_NAMES
    if not profile_diags:
        return ()
    names = tuple(profile_diags)
    unknown = [n for n in names if n not in ALL_PROFILE_NAMES]
    if unknown:
        raise ValueError(f"unknown diagnostic streams: {unknown}")
    return names


def initial_state(case: Case, dtype=jnp.float64) -> KidState:
    grid = case.grid()
    theta = np.broadcast_to(case.theta_init(grid.z), (case.nx, case.nz))
    qv = np.broadcast_to(case.qv_init(grid.z), (case.nx, case.nz))
    z = jnp.zeros((case.nx, case.nz), dtype)
    # aerosol/droplet-number init: the case may prescribe per-kg profiles;
    # defaults are the reference's non-aerosol fills (f90:957-964)
    nc0 = case.micro.nt_c / grid.rho0
    nwfa0 = (case.nwfa_init(grid.z) if case.nwfa_init is not None
             else 11.1e6 / grid.rho0)
    nifa0 = (case.nifa_init(grid.z) if case.nifa_init is not None
             else c.NA_IN1 * 0.01 / grid.rho0)

    def bcast(p):
        return jnp.asarray(np.broadcast_to(p, (case.nx, case.nz)), dtype)

    return KidState(
        theta=jnp.asarray(theta, dtype), qv=jnp.asarray(qv, dtype),
        qc=z, qr=z, nr=z, qi=z, ni=z, qs=z, qg=z,
        nc=bcast(nc0), nwfa=bcast(nwfa0), nifa=bcast(nifa0))


def advected_fields(cfg) -> tuple:
    """Which tracers the kinematic shell advects (static per config).

    The reference wrapper round-trips exactly the 9 scheme fields
    (mphys_thompson09n.f90:198-245); nc/nwfa/nifa are this framework's
    aerosol-mode prognostics (module_mp_thompson09n.f90:950-956 gathers
    them only when is_aerosol_aware) and are advected only then — in
    non-aerosol mode the solver forces nc and never reads nwfa/nifa, so
    advecting them would burn ~25% of the advection stack on physically
    inert tracers.  Warm-only (iiwarm) cases additionally skip the
    identically-zero ice species: flux-form advection of an exactly-zero
    field is exactly zero, so the skip is bitwise-exact as long as the
    case starts ice-free (every KiD warm case does)."""
    if cfg.is_aerosol_aware:
        return KidState._fields
    if cfg.iiwarm:
        return ("theta", "qv", "qc", "qr", "nr")
    return ("theta", "qv", "qc", "qr", "nr", "qi", "ni", "qs", "qg")


def make_step(case: Case, tables, dtype, w_pat, u_pat_faces, pres2, pad_x,
              profile_names: tuple):
    """Build the per-step function (advect -> microphysics -> update).

    SINGLE source of truth for the step physics: ``simulate`` wraps it with
    local periodic x-padding, ``dist.mesh.simulate_sharded`` with
    halo-exchanged padding — the two paths differ ONLY in ``pad_x``.

    The advected tracers (``advected_fields``: 5 warm / 9 mixed / 12
    aerosol-aware) travel as one stacked (n_adv, nloc, nz) tensor, so the
    sharded path needs exactly ONE ppermute pair per step (not one per
    tracer).

    Args:
      w_pat:       (nloc, nz+1) rho0*w z-face pattern (local shard).
      u_pat_faces: (nloc+1, nz) local rho0*u' x-face pattern, None for 1-D.
      pres2:       (nloc, nz) pressure.
      pad_x:       callable (12, nloc, nz) -> (12, nloc+4, nz) adding 2 ghost
                   columns per side; unused for 1-D cases.
      profile_names: static tuple from ``resolve_profile_names``.
    """
    grid = case.grid()
    dz = jnp.asarray(grid.dz, dtype)
    rho0 = jnp.asarray(grid.rho0, dtype)
    exner = jnp.asarray(grid.exner, dtype)[None, :]
    rho_face = jnp.concatenate([rho0[:1], 0.5 * (rho0[1:] + rho0[:-1]),
                                rho0[-1:]])
    nloc = pres2.shape[0]
    dzq2 = jnp.broadcast_to(dz, (nloc, case.nz))
    dt = case.dt
    odt = 1.0 / dt
    cfg = case.micro
    one_d = u_pat_faces is None
    # only materialize the 36 per-process rate profiles when a requested
    # diagnostic stream actually needs them
    want_rates = any(n in RATE_NAMES for n in profile_names)
    # Fully-fused DRIVER step (advection + provisional state + Exner
    # mapping + solver in one kernel, pallas_step.fused_kid_step):
    # measured SLOWER than the default (mixed1 21.5 vs 20.0 ms/step,
    # warm1 5.8 vs 4.8 at (8192,120) f32) because the XLA stage must
    # still run the advection + provisional state to compute the gather
    # indices, so fusing it into the kernel only duplicates that work and
    # widens the kernel.  Kept opt-in (KID_TPU_PALLAS_DRIVER=1) as a
    # measured negative result — see prof/README.md.
    import os
    from ..micro.solver import pallas_enabled
    fused_driver = (one_d and pallas_enabled(cfg)
                    and not cfg.is_aerosol_aware
                    and os.environ.get("KID_TPU_PALLAS_DRIVER", "0") == "1")
    adv_fields = advected_fields(cfg)
    adv_idx = tuple(KidState._fields.index(f) for f in adv_fields)

    def step(st: KidState, istep):
        t = istep.astype(dtype) * dt
        m = case.time_modulation(t)
        w_face = m * w_pat                       # rho0*w at z-faces
        q = jnp.stack([st[i] for i in adv_idx])  # (n_adv, nloc, nz)

        # d*_adv + d*_div (the two streams the reference wrapper sums at
        # mphys_thompson09n.f90:60-93).  1-D: flux-form vertical advection
        # + compensating divergence closure.  2-D: stream-function fluxes
        # are exactly non-divergent, so the div stream is zero.
        ten = advective_tendency_z(q, w_face, rho0, dz)
        if one_d:
            ten = ten + divergence_tendency_z(q, w_face, rho0, dz)
        else:
            u_face = case.u0 * rho0[None, :] + m * u_pat_faces
            ten = ten + advective_tendency_x_padded(
                pad_x(q), u_face, rho0, case.dx)

        # provisional state (x + adv*dt), mapped to the micro's T/state
        # (mphys_thompson09n.f90:60-93); non-advected tracers pass
        # through (see advected_fields)
        prov = q + ten * dt
        prov_named = dict(st._asdict())
        prov_named.update(zip(adv_fields, prov))
        t_p = prov_named["theta"] * exner
        qv_p = prov_named["qv"]
        w_vel = w_face / rho_face                # velocity for activ_ncloud
        w_cent = 0.5 * (w_vel[:, 1:] + w_vel[:, :-1])
        # nc/nwfa/nifa: advected prognostics (module_mp_thompson09n.f90:
        # 950-956 aerosol-aware gather).  In non-aerosol mode the solver
        # forces nc = Nt_c/rho itself (f90:1410), reproducing the
        # reference's per-step reset without the driver lying about state.
        micro_in = ColumnState(
            t=t_p, qv=qv_p,
            qc=prov_named["qc"], qi=prov_named["qi"], qr=prov_named["qr"],
            qs=prov_named["qs"], qg=prov_named["qg"], ni=prov_named["ni"],
            nr=prov_named["nr"],
            nc=prov_named["nc"], nwfa=prov_named["nwfa"],
            nifa=prov_named["nifa"])
        if fused_driver:
            # the provisional state above feeds ONLY the fused gather-index
            # chain; the kernel re-derives advection + provisional state +
            # solver VMEM-resident from the raw scan carry
            from ..micro import solver as S
            from ..micro.pallas_step import fused_kid_step
            pro, idx = S._prologue(micro_in, pres2, cfg)
            tv = S._table_stage(pro, idx, tables, cfg, float(dt))
            new, ppt, diag = fused_kid_step(
                st, w_pat[0], m, tv, grid.pres, grid.exner, grid.rho0,
                grid.dz, cfg, float(dt), want_rates)
        else:
            out, ppt, diag = batched_microphysics(
                micro_in, pres2, w_cent, dzq2, dt, tables, cfg,
                want_rates=want_rates)

            new = KidState(
                theta=out.t / exner, qv=out.qv, qc=out.qc, qr=out.qr,
                nr=out.nr, qi=out.qi, ni=out.ni, qs=out.qs, qg=out.qg,
                nc=out.nc, nwfa=out.nwfa, nifa=out.nifa)
        new_named = new._asdict()
        profs = {}
        for name in profile_names:
            if name in diag:
                profs[name] = diag[name]
            elif name in new_named:
                profs[name] = new_named[name]
            else:
                # d<field>_mphys back-out (mphys_thompson09n.f90:198-245)
                f = name[1:-len("_mphys")]
                profs[name] = (new_named[f] - prov_named[f]) * odt
        outs = ScanOutputs(
            ppt=jnp.stack([ppt.rain, ppt.snow, ppt.graupel, ppt.ice]),
            profiles=profs)
        return new, outs

    return step


@partial(jax.jit,
         static_argnames=("case", "n_steps", "profile_diags", "istep0"))
def simulate(state0: KidState, tables, case: Case, n_steps: int,
             profile_diags=False, istep0: int = 0):
    """Run ``n_steps`` of the case from ``state0``; returns final state and
    per-step diagnostics.  ``profile_diags``: False/True/tuple of stream
    names (see ``resolve_profile_names``).  ``istep0``: starting step
    index — pass the number of steps already taken when CHUNKING a run
    across multiple simulate() calls, so the prescribed-flow time
    modulation m(t) continues instead of replaying the pulse from t=0."""
    grid = case.grid()
    dtype = state0.qv.dtype
    pres2 = jnp.broadcast_to(jnp.asarray(grid.pres, dtype),
                             (case.nx, case.nz))
    w_pat = jnp.asarray(case.rhow_pattern(grid), dtype)
    u_pat = (None if case.is_1d
             else jnp.asarray(case.rhou_pattern(grid), dtype))

    def pad_x(q):        # periodic: wrap 2 columns from each end
        return jnp.concatenate([q[:, -2:], q, q[:, :2]], axis=1)

    step = make_step(case, tables, dtype, w_pat, u_pat, pres2, pad_x,
                     resolve_profile_names(profile_diags))
    final, raw = jax.lax.scan(
        step, state0, jnp.arange(istep0, istep0 + n_steps))
    return final, _unpack_streams(raw)


def run_case(case: Case, dtype=jnp.float64, n_steps=None,
             profile_diags=False):
    """Convenience host-side entry: tables + init + simulate."""
    tables = device_tables(get_tables(iiwarm=case.micro.iiwarm), dtype)
    state0 = initial_state(case, dtype)
    n = case.n_steps if n_steps is None else n_steps
    return simulate(state0, tables, case, n, profile_diags)
