"""Flux-form finite-volume transport by the prescribed kinematic flow.

This is the KiD shell's ``d*_adv`` / ``d*_div`` tendency producer (the
wrapper consumes both at mphys_thompson09n.f90:60-93; the producer itself is
absent from the checkout).  Design is TPU-first and mimetic:

  * transport is driven by face **mass fluxes** (rho0*w, rho0*u).  2-D cases
    derive them by differencing a discrete stream function evaluated at cell
    corners, so the discrete divergence telescopes to zero EXACTLY and a
    uniform tracer is preserved to machine precision;
  * 1-D updraft cases are genuinely divergent (the updraft implies
    unrepresented horizontal inflow); the standard KiD closure is a
    compensating divergence tendency ``d*_div = q * div(rho0 w)/rho0`` so
    that adv+div reduces to pure advective form — that is exactly the
    ``d*_div`` stream the reference wrapper consumes;
  * second-order MUSCL reconstruction with a van Leer limiter (monotone,
    branch-free, vectorized over (ncol, nz)); periodic in x.

The horizontal stencil (2-wide halo) is the halo-exchange surface for
multi-device sharding (kid_tpu.dist).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _zero_end_faces(flux):
    """Zero the bottom/top boundary faces (zero-flux BC).  Formulated as a
    lane-index mask rather than ``.at[...].set`` so the same code lowers
    inside a Mosaic kernel (the fused TPU driver step runs the whole 1-D
    advection in-kernel); identical values either way."""
    n = flux.shape[-1]
    kk = lax.broadcasted_iota(jnp.int32, (1, n), 1).reshape(
        (1,) * (flux.ndim - 1) + (n,))
    return jnp.where((kk == 0) | (kk == n - 1), 0.0, flux)


def _vanleer(r):
    """van Leer limiter phi(r) = (r + |r|) / (1 + |r|)."""
    return (r + jnp.abs(r)) / (1.0 + jnp.abs(r))


def _muscl_face_values(qpad, vel_face):
    """MUSCL face values along the last axis.

    ``qpad`` (..., n+2) cell values including one ghost cell each side;
    ``vel_face`` (..., n+1) face-normal velocity/mass-flux signs.
    Returns face values (..., n+1) for the n+1 faces between the n+2 cells.
    """
    dq = jnp.diff(qpad, axis=-1)                       # (..., n+1)
    zero = jnp.zeros_like(qpad[..., :1])
    dq_m = jnp.concatenate([zero, dq], axis=-1)        # q_i - q_{i-1}
    dq_p = jnp.concatenate([dq, zero], axis=-1)        # q_{i+1} - q_i
    eps = 1e-30
    r_up = dq_m / jnp.where(jnp.abs(dq_p) > eps, dq_p, eps)
    r_dn = dq_p / jnp.where(jnp.abs(dq_m) > eps, dq_m, eps)
    slope_up = _vanleer(r_up) * dq_p
    slope_dn = _vanleer(r_dn) * dq_m
    q_left = (qpad + 0.5 * slope_up)[..., :-1]         # donor cell i
    q_right = (qpad - 0.5 * slope_dn)[..., 1:]         # donor cell i+1
    return jnp.where(vel_face >= 0.0, q_left, q_right)


def advective_tendency_z(q, rhow_face, rho0, dz):
    """d(q)/dt = -(1/rho0) d(F_z q)/dz, F_z = rho0*w at z-faces.

    Zero-flux top/bottom (KiD kinematic updrafts vanish at z=0, ztop).

    Args:
      q:         (..., nz) tracer.
      rhow_face: (..., nz+1) vertical mass flux at faces.
      rho0:      (nz,) basic-state density at centers.
      dz:        (nz,) layer thickness.
    """
    ghost_lo = q[..., :1]
    ghost_hi = q[..., -1:]
    qpad = jnp.concatenate([ghost_lo, q, ghost_hi], axis=-1)
    qf = _muscl_face_values(qpad, rhow_face)
    flux = _zero_end_faces(rhow_face * qf)
    return -(flux[..., 1:] - flux[..., :-1]) / (rho0 * dz)


def divergence_tendency_z(q, rhow_face, rho0, dz):
    """KiD 1-D mass-compensation term: d*_div = q * div(rho0 w)/rho0.

    Together with the flux-form d*_adv this reduces to pure advective
    transport -w dq/dz, so a uniform tracer sees zero total tendency."""
    flux = _zero_end_faces(rhow_face)
    return q * (flux[..., 1:] - flux[..., :-1]) / (rho0 * dz)


def advective_tendency_x_padded(q_padded, rhou_face, rho0, dx):
    """x-transport given a 2-ghost-padded tracer.

    Args:
      q_padded:  (ncol+4, nz) tracer with 2 ghost columns each side (filled
                 periodically for single-device, by halo exchange when the
                 column axis is sharded over a mesh — kid_tpu.dist).
      rhou_face: (ncol+1, nz) horizontal mass flux at the local x-faces.
      rho0:      (nz,) center density.
      dx:        scalar spacing.
    """
    qx = jnp.moveaxis(q_padded, -2, -1)                # (..., nz, ncol+4)
    fx = jnp.swapaxes(rhou_face, 0, 1)                 # (nz, ncol+1)
    fx_ext = jnp.concatenate([fx[..., :1], fx, fx[..., -1:]], axis=-1)
    qf = _muscl_face_values(qx, fx_ext)[..., 1:-1]
    flux = fx * qf
    ten = -(flux[..., 1:] - flux[..., :-1]) / (rho0[:, None] * dx)
    return jnp.moveaxis(ten, -1, -2)


def advective_tendency_x(q, rhou_face, rho0, dx):
    """d(q)/dt = -(1/rho0) d(F_x q)/dx, F_x = rho0*u at x-faces; periodic.

    Args:
      q:         (ncol, nz) tracer.
      rhou_face: (ncol+1, nz) horizontal mass flux at x-faces
                 (rhou_face[0] == rhou_face[ncol], the periodic face).
      rho0:      (nz,) center density.
      dx:        scalar spacing.

    2 ghost cells per side give every retained face a full MUSCL stencil, so
    the two copies of the periodic face get identical fluxes (exact
    conservation across the seam).
    """
    qpad = jnp.concatenate([q[-2:], q, q[:2]], axis=0)
    return advective_tendency_x_padded(qpad, rhou_face, rho0, dx)
