"""Multi-device execution: column sharding + halo exchange over the mesh.

TPU-native replacement for the reference's (compiled-out) MPI layer
(wrf_dm_decomp1d/wrf_dm_gatherv, module_mp_thompson09n.f90:3744-3749,
3813-3820) and for the KiD shell's missing domain decomposition:

  * microphysics is embarrassingly column-parallel (the reference's serial
    ``do i=1,nx`` loop, mphys_thompson09n.f90:54) -> shard the column axis
    of the (ncol, nz) state over a 1-D device mesh with ``shard_map``; no
    collectives in the hot loop;
  * the 2-D advection stencil needs a 2-column halo -> ``lax.ppermute``
    ring exchange over ICI, the only communication per step;
  * diagnostics reductions (domain means, total precip) ride ``psum``.

The vertical dimension is never sharded (a column fits VMEM; the sweeps are
sequential in k — SURVEY.md §2.3).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from .. import constants as c
from ..micro import ColumnState, batched_microphysics
from ..driver.advection import (advective_tendency_x_padded,
                                advective_tendency_z,
                                divergence_tendency_z)
from ..driver.loop import KidState, StepOutputs

from jax import shard_map as _shard_map_new


def shard_map(f, mesh, in_specs, out_specs, **_kw):
    return _shard_map_new(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)

AXIS = "cols"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


def halo_exchange_x(q, axis_name: str = AXIS, width: int = 2):
    """Ring exchange of ``width`` edge columns with both neighbors.

    Returns (from_left, from_right): the left neighbor's rightmost and the
    right neighbor's leftmost ``width`` columns (periodic global domain).
    """
    n = lax.axis_size(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_left = lax.ppermute(q[-width:], axis_name, fwd)
    from_right = lax.ppermute(q[:width], axis_name, bwd)
    return from_left, from_right


def sharded_tendency_x(q, rhou_face_local, rho0, dx, axis_name: str = AXIS):
    """Distributed x-advection: halo exchange + local MUSCL fluxes.

    Both copies of a shard-boundary face see the same 4-cell stencil, so the
    flux is bitwise-identical on both sides — conservation holds across
    shards exactly as it does across the periodic seam.
    """
    left, right = halo_exchange_x(q, axis_name)
    qpad = jnp.concatenate([left, q, right], axis=0)
    return advective_tendency_x_padded(qpad, rhou_face_local, rho0, dx)


@partial(jax.jit, static_argnames=("case", "n_steps", "mesh",
                                   "profile_diags"))
def simulate_sharded(state0: KidState, tables, case, n_steps: int,
                     mesh: Mesh, profile_diags: bool = False):
    """Distributed twin of ``driver.loop.simulate``: same physics, columns
    sharded over ``mesh``; one ppermute halo exchange per tracer per step."""
    grid = case.grid()
    dtype = state0.qv.dtype
    dz = jnp.asarray(grid.dz, dtype)
    rho0 = jnp.asarray(grid.rho0, dtype)
    exner = jnp.asarray(grid.exner, dtype)[None, :]
    pres_full = jnp.broadcast_to(jnp.asarray(grid.pres, dtype),
                                 (case.nx, case.nz))
    rho_face = jnp.concatenate([rho0[:1], 0.5 * (rho0[1:] + rho0[:-1]),
                                rho0[-1:]])
    w_pat_full = jnp.asarray(case.rhow_pattern(grid), dtype)
    # per-shard u faces: shard i owns faces [i*nloc, (i+1)*nloc], one
    # overlapping face with its right neighbor — build as (nx, nz, 2)
    # (left face, right face per column) to keep the shard axis clean
    if case.nx > 1:
        u_full = np.asarray(case.rhou_pattern(grid))
        u_lr = np.stack([u_full[:-1], u_full[1:]], axis=-1)  # (nx, nz, 2)
        u_pat_full = jnp.asarray(u_lr, dtype)
    else:
        u_pat_full = None
    dt = case.dt
    cfg = case.micro
    nt_c = cfg.nt_c
    n_dev = mesh.devices.size

    def body(st0, w_pat, u_pat, pres2):
        nloc = st0.qv.shape[0]
        dzq2 = jnp.broadcast_to(dz, (nloc, case.nz))

        def step(carry, istep):
            st = carry
            t = istep.astype(dtype) * dt
            m = case.time_modulation(t)
            w_face = m * w_pat

            if u_pat is not None:
                # reassemble the nloc+1 local faces from the (nloc, 2) pairs
                u_loc = case.u0 * rho0[None, :] + m * u_pat[..., 0]
                u_last = case.u0 * rho0[None, :] + m * u_pat[-1:, :, 1]
                u_faces = jnp.concatenate([u_loc, u_last], axis=0)

                def adv(q):
                    return (advective_tendency_z(q, w_face, rho0, dz)
                            + sharded_tendency_x(q, u_faces, rho0, case.dx))
            else:
                def adv(q):
                    return (advective_tendency_z(q, w_face, rho0, dz)
                            + divergence_tendency_z(q, w_face, rho0, dz))

            a = KidState(*[adv(getattr(st, f)) for f in KidState._fields])
            th_p = st.theta + a.theta * dt
            t_p = th_p * exner
            qv_p = st.qv + a.qv * dt
            rho_p = 0.622 * pres2 / (c.R_GAS * t_p * (qv_p + 0.622))
            w_vel = w_face / rho_face
            w_cent = 0.5 * (w_vel[:, 1:] + w_vel[:, :-1])
            micro_in = ColumnState(
                t=t_p, qv=qv_p,
                qc=st.qc + a.qc * dt, qi=st.qi + a.qi * dt,
                qr=st.qr + a.qr * dt, qs=st.qs + a.qs * dt,
                qg=st.qg + a.qg * dt, ni=st.ni + a.ni * dt,
                nr=st.nr + a.nr * dt,
                nc=nt_c / rho_p, nwfa=11.1e6 / rho_p,
                nifa=c.NA_IN1 * 0.01 / rho_p)
            out, ppt, diag = batched_microphysics(
                micro_in, pres2, w_cent, dzq2, dt, tables, cfg)
            new = KidState(theta=out.t / exner, qv=out.qv, qc=out.qc,
                           qr=out.qr, nr=out.nr, qi=out.qi, ni=out.ni,
                           qs=out.qs, qg=out.qg)
            profs = {}
            if profile_diags:
                profs = {"qc": out.qc, "qr": out.qr, "qv": out.qv}
            return new, StepOutputs(ppt_rain=ppt.rain, ppt_snow=ppt.snow,
                                    ppt_graupel=ppt.graupel,
                                    ppt_ice=ppt.ice, profiles=profs)

        return lax.scan(step, st0, jnp.arange(n_steps))

    state_spec = KidState(*[P(AXIS, None)] * len(KidState._fields))
    prof_spec = ({"qc": P(None, AXIS, None), "qr": P(None, AXIS, None),
                  "qv": P(None, AXIS, None)} if profile_diags else {})
    out_stream_spec = StepOutputs(
        ppt_rain=P(None, AXIS), ppt_snow=P(None, AXIS),
        ppt_graupel=P(None, AXIS), ppt_ice=P(None, AXIS),
        profiles=prof_spec)
    u_spec = P(AXIS, None, None) if u_pat_full is not None else None
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(state_spec, P(AXIS, None), u_spec, P(AXIS, None)),
        out_specs=(state_spec, out_stream_spec),
        check_vma=False)
    return fn(state0, w_pat_full, u_pat_full, pres_full)
