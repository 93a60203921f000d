"""Aerosol-aware microphysics functions (MPAS heritage, C11 in SURVEY.md).

Reference: module_mp_thompson09n.f90:4354-4390 (Eff_aero), :4451-4526
(activ_ncloud), :4720-4756 (iceDeMott), :4764-4789 (iceKoop), :4794-4823
(delta_p).  In the KiD configuration ``is_aerosol_aware=.false.`` these are
inactive (and ``tnccn_act == 1`` makes activation trivial, f90:752-762), but
they are part of the scheme's API surface and are implemented for the
aerosol-aware mode.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import constants as c
from .fastmath import exp10, powc


def eff_aero(d, da, visc, rhoa, temp, species: str):
    """Slinn/Wang aerosol-scavenging collision efficiency (f90:4354-4390).

    ``species`` in {'r','s','g'} picks the collector fallspeed law.
    Constant-exponent powers go through fastmath.powc: a generic pow HLO
    lowers to a guarded exp/log chain on TPU (~20 transcendentals/site,
    prof/README.md), and this function runs per cell at up to 6 call
    sites per aerosol step.
    """
    if species == "r":
        vt = (-0.1021 + 4.932e3 * d - 0.9551e6 * d * d
              + 0.07934e9 * d ** 3 - 0.002362e12 * d ** 4)
    elif species == "s":
        vt = c.AV_S * powc(d, c.BV_S)
    elif species == "g":
        vt = c.AV_G * powc(d, c.BV_G)
    else:
        raise ValueError(species)
    boltzman = 1.3806503e-23
    mean_path = 0.0256e-6
    cc = 1.0 + 2.0 * mean_path / da * (1.257
                                       + 0.4 * jnp.exp(-0.55 * da
                                                       / mean_path))
    diff = boltzman * temp * cc / (3.0 * c.PI * visc * da)
    re = 0.5 * rhoa * d * vt / visc
    sc = visc / (rhoa * diff)
    st = da * da * vt * 1000.0 / (9.0 * visc * d)
    aval = 1.0 + jnp.log(1.0 + re)
    st2 = (1.2 + 1.0 / 12.0 * aval) / (1.0 + aval)
    eff = (4.0 / (re * sc) * (1.0 + 0.4 * jnp.sqrt(re) * powc(sc, 1.0 / 3.0)
                              + 0.16 * jnp.sqrt(re) * jnp.sqrt(sc))
           + 4.0 * da / d * (0.02 + da / d * (1.0 + 2.0 * jnp.sqrt(re))))
    eff = eff + jnp.where(
        st > st2, powc(jnp.maximum(st - st2, 0.0)
                       / (st - st2 + 0.666667), 1.5), 0.0)
    return jnp.clip(eff, 1.0e-5, 1.0)


# host-side log bin edges for the activation interp (f90:4489-4500); the
# per-cell path needs only log(n_local)/log(w_local) — the edge logs are
# compile-time constants fetched by the same one-hot rows
_LOG_TA_NA = np.log(np.asarray(c.TA_NA))
_LOG_TA_WW = np.log(np.asarray(c.TA_WW))


def activ_ncloud(tt, ww, nccn, tnccn_corners):
    """CCN activation by bilinear log-interp into the 5-D activation table
    (f90:4451-4526).  With the variant's table == 1.0 this returns NCCN.

    ``tnccn_corners`` is the (7*9*7, 4) pre-arranged corner matrix of
    the fixed (l=2, m=1) plane (solver._tnccn_corners): the 4 bilinear
    corners arrive as ONE exact one-hot MXU row fetch per cell instead
    of 4 scattered (ncol, nz)-index gathers (~3.4 ms each at 1M cells
    on a v5e — the dominant cost of the round-4 aerosol step)."""
    from .solver import _rows

    # python-float bounds: a np.float64 scalar would promote the f32
    # state to f64 under jax_enable_x64 (weak-typing rule)
    n_local = jnp.clip(nccn * 1.0e-6, float(c.TA_NA[0]) + 1.0,
                       float(c.TA_NA[-1]) - 1.0)
    w_local = jnp.clip(ww, float(c.TA_WW[0]) + 0.001,
                       float(c.TA_WW[-1]) - 1.0)
    i = jnp.clip(jnp.searchsorted(jnp.asarray(c.TA_NA), n_local,
                                  side="right"), 1, len(c.TA_NA) - 1)
    j = jnp.clip(jnp.searchsorted(jnp.asarray(c.TA_WW), w_local,
                                  side="right"), 1, len(c.TA_WW) - 1)
    k = jnp.clip((jnp.round((tt - c.TA_TK[0]) * 0.1)).astype(jnp.int32) + 1,
                 1, len(c.TA_TK)) - 1
    nj, nk = len(c.TA_WW), len(c.TA_TK)
    corners = _rows(tnccn_corners, (i * nj + j) * nk + k)
    a, b, cc, dd = (corners[..., 0], corners[..., 1], corners[..., 2],
                    corners[..., 3])
    x1 = _rows(jnp.asarray(_LOG_TA_NA[:-1, None], tnccn_corners.dtype),
               i - 1)[..., 0]
    x2 = _rows(jnp.asarray(_LOG_TA_NA[1:, None], tnccn_corners.dtype),
               i - 1)[..., 0]
    y1 = _rows(jnp.asarray(_LOG_TA_WW[:-1, None], tnccn_corners.dtype),
               j - 1)[..., 0]
    y2 = _rows(jnp.asarray(_LOG_TA_WW[1:, None], tnccn_corners.dtype),
               j - 1)[..., 0]
    t = (jnp.log(n_local) - x1) / (x2 - x1)
    u = (jnp.log(w_local) - y1) / (y2 - y1)
    frac = ((1.0 - t) * (1.0 - u) * a + t * (1.0 - u) * b + t * u * cc
            + (1.0 - t) * u * dd)
    return nccn * frac


def ice_demott(tempc, qv, qvs, qvsi, rho, nifa):
    """DeMott et al. (2010) dust ice-nucleation count (f90:4720-4756)."""
    rho_not0 = 101325.0 / (287.05 * 273.15)
    nifa_cc = nifa * rho_not0 * 1.0e-6 / rho
    xni = (5.94e-5 * jnp.power(-tempc, 3.33)
           * jnp.power(nifa_cc, (-0.0264 * tempc) + 0.0033))
    xni = xni * rho / rho_not0 * 1000.0
    return jnp.maximum(0.0, xni)


def ice_koop(temp, qv, qvs, naero, dt):
    """Koop et al. (2001) homogeneous aerosol freezing, J-rate reduced 100x
    (f90:4764-4789)."""
    satw = qv / qvs
    mu_diff = (210368.0 + 131.438 * temp - 3.32373e6 / temp
               - 41729.1 * jnp.log(temp))
    a_w_i = jnp.exp(mu_diff / (c.R_UNI * temp))
    delta_aw = satw - a_w_i
    log_j = (-906.7 + 8502.0 * delta_aw - 26924.0 * delta_aw ** 2
             + 29180.0 * delta_aw ** 3)
    j_rate = exp10(jnp.minimum(20.0, log_j))
    prob_h = jnp.minimum(1.0 - jnp.exp(-j_rate * c.AR_VOLUME * dt), 1.0)
    xni = jnp.where(prob_h > 0.0, jnp.minimum(prob_h * naero, 1000.0e3),
                    0.0)
    return jnp.maximum(0.0, xni)


def delta_p(yy, y1, y2, aa, bb):
    """Phillips et al. (2008) cubic-interpolation helper (f90:4794-4823)."""
    a_ = 6.0 * (aa - bb) / ((y2 - y1) ** 3)
    b_ = aa + a_ * y1 ** 3 / 6.0 - a_ * y1 * y1 * y2 * 0.5
    a0, a1 = b_, a_ * y1 * y2
    a2, a3 = -a_ * (y1 + y2) * 0.5, a_ / 3.0
    dab = jnp.where(yy <= y1, aa,
                    jnp.where(yy >= y2, bb,
                              a0 + a1 * yy + a2 * yy ** 2 + a3 * yy ** 3))
    return jnp.clip(dab, aa, bb)
