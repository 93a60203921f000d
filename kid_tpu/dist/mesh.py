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

from ..driver.advection import advective_tendency_x_padded
from ..driver.loop import (KidState, ScanOutputs, _unpack_streams,
                           make_step, resolve_profile_names)

from jax import shard_map as _shard_map_new


def shard_map(f, mesh, in_specs, out_specs, **_kw):
    return _shard_map_new(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)

AXIS = "cols"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


def halo_exchange_x(q, axis_name: str = AXIS, width: int = 2,
                    axis: int = 0):
    """Ring exchange of ``width`` edge columns with both neighbors.

    Returns (from_left, from_right): the left neighbor's rightmost and the
    right neighbor's leftmost ``width`` columns (periodic global domain).
    ``axis`` selects which array axis holds the sharded columns, so a whole
    tracer stack (12, nloc, nz) exchanges with ONE ppermute pair.
    """
    n = lax.axis_size(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    size = q.shape[axis]
    from_left = lax.ppermute(
        lax.slice_in_dim(q, size - width, size, axis=axis), axis_name, fwd)
    from_right = lax.ppermute(
        lax.slice_in_dim(q, 0, width, axis=axis), axis_name, bwd)
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
                     mesh: Mesh, profile_diags=False):
    """Distributed twin of ``driver.loop.simulate``: the SAME ``make_step``
    physics, columns sharded over ``mesh``; the tracer stack is halo-
    exchanged with ONE ppermute pair per step."""
    grid = case.grid()
    dtype = state0.qv.dtype
    pres_full = jnp.broadcast_to(jnp.asarray(grid.pres, dtype),
                                 (case.nx, case.nz))
    w_pat_full = jnp.asarray(case.rhow_pattern(grid), dtype)
    # per-shard u faces: shard i owns faces [i*nloc, (i+1)*nloc], one
    # overlapping face with its right neighbor — build as (nx, nz, 2)
    # (left face, right face per column) to keep the shard axis clean
    if not case.is_1d:       # nx alone doesn't decide: a 1-D case can
        # be WIDENED to nx identical columns (cases.Case.is_1d)
        u_full = np.asarray(case.rhou_pattern(grid))
        u_lr = np.stack([u_full[:-1], u_full[1:]], axis=-1)  # (nx, nz, 2)
        u_pat_full = jnp.asarray(u_lr, dtype)
    else:
        u_pat_full = None
    names = resolve_profile_names(profile_diags)

    def body(st0, w_pat, u_pat, pres2):
        if u_pat is not None:
            # reassemble the nloc+1 local face pattern from (nloc, nz, 2)
            u_faces = jnp.concatenate([u_pat[..., 0], u_pat[-1:, :, 1]],
                                      axis=0)
        else:
            u_faces = None

        def pad_x(q):    # (12, nloc, nz): one ppermute pair for all tracers
            left, right = halo_exchange_x(q, AXIS, 2, axis=1)
            return jnp.concatenate([left, q, right], axis=1)

        step = make_step(case, tables, dtype, w_pat, u_faces, pres2,
                         pad_x, names)
        return lax.scan(step, st0, jnp.arange(n_steps))

    state_spec = KidState(*[P(AXIS, None)] * len(KidState._fields))
    prof_spec = {n: P(None, AXIS, None) for n in names}
    out_stream_spec = ScanOutputs(ppt=P(None, None, AXIS),
                                  profiles=prof_spec)
    u_spec = P(AXIS, None, None) if u_pat_full is not None else None
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(state_spec, P(AXIS, None), u_spec, P(AXIS, None)),
        out_specs=(state_spec, out_stream_spec),
        check_vma=False)
    final, raw = fn(state0, w_pat_full, u_pat_full, pres_full)
    return final, _unpack_streams(raw)
