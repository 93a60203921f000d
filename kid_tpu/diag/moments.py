"""PSD-moment diagnostics: radiation effective radii and 10-cm radar
reflectivity (C14/C15 in SURVEY.md).

Reference: calc_effectRad (module_mp_thompson09n.f90:4834-4935) and
calc_refl10cm (:4946-5244).  Rank-polymorphic over (..., nz) like the
solver.  The reference's wet-melting Blahak soak integration is disabled in
the KiD build (nrbins=0 at :204, code commented :5159-5189), so dBZ comes
from the dry Rayleigh terms — reproduced as-is.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .. import constants as c
from ..micro.solver import (CGE, CGG, CIE, CIG, CRE, CRG, _field_moment,
                            _graupel_psd, _rain_psd)

G_RATIO = jnp.asarray([24, 60, 120, 210, 336, 504, 720, 990, 1320, 1716,
                       2184, 2730, 3360, 4080, 4896.0])


def effective_radii(t, p, qv, qc, nc, qi, ni, qs, nt_c: float,
                    is_aerosol_aware: bool = False):
    """Effective radii of cloud/ice/snow (f90:4834-4935).

    Returns (re_cloud, re_ice, re_snow) in meters, clamped to the
    reference's [2.49,50]/[4.99,125]/[9.99,999] micron windows.
    """
    rho = 0.622 * p / (c.R_GAS * t * (qv + 0.622))
    rc = jnp.maximum(c.R1, qc * rho)
    nc_ = jnp.maximum(c.R2, nc * rho)
    if not is_aerosol_aware:
        nc_ = jnp.full_like(nc_, nt_c)
    ri = jnp.maximum(c.R1, qi * rho)
    ni_ = jnp.maximum(c.R2, ni * rho)
    rs = jnp.maximum(c.R1, qs * rho)

    # cloud (f90:4872-4885): nu_c from number, g_ratio table
    inu = jnp.where(nc_ < 100.0, 15,
                    jnp.where(nc_ > 1.0e10, 2,
                              jnp.minimum(15, (jnp.floor(1000.0e6 / nc_
                                                         + 0.5)
                                               + 2).astype(jnp.int32))))
    gr = G_RATIO[jnp.clip(inu, 2, 15) - 1]
    lamc = jnp.power(nc_ * c.AM_R * gr / rc, c.OBMR)
    # active floor 2.51 um (f90:4884), inactive default 2.49 um (the value
    # the WRF driver presets before the CYCLE'd levels)
    re_qc = jnp.clip(0.5 * (3.0 + inu) / lamc, 2.51e-6, 50.0e-6)
    re_qc = jnp.where((rc > c.R1) & (nc_ > c.R2), re_qc, 2.49e-6)

    # ice (f90:4887-4893)
    lami = jnp.power(c.AM_I * CIG[2] * c.OIG1 * ni_ / ri, c.OBMI)
    re_qi = jnp.clip(0.5 * (3.0 + c.MU_I) / lami, 5.01e-6, 125.0e-6)
    re_qi = jnp.where((ri > c.R1) & (ni_ > c.R2), re_qi, 4.99e-6)

    # snow via Field moments (f90:4895-4932)
    tc0 = jnp.minimum(-0.1, t - 273.15)
    smob = rs * c.OAMS
    smoc = _field_moment(jnp.log10(jnp.maximum(smob, 1e-35)), tc0,
                         float(c.CSE[1]))
    re_qs = jnp.clip(0.5 * smoc / jnp.maximum(smob, 1e-30),
                     10.0e-6, 999.0e-6)
    re_qs = jnp.where(rs > c.R1, re_qs, 9.99e-6)
    return re_qc, re_qi, re_qs


def refl_10cm(qv, qc, qr, nr, qs, qg, t, p, iiwarm: bool = False):
    """10-cm Rayleigh radar reflectivity [dBZ] (f90:4946-5244)."""
    nz = t.shape[-1]
    temp = t
    qv_ = jnp.maximum(1.0e-10, qv)
    rho = 0.622 * p / (c.R_GAS * temp * (qv_ + 0.622))

    l_qr = qr > c.R1
    rr = jnp.where(l_qr, qr * rho, c.R1)
    nr_ = jnp.where(l_qr, jnp.maximum(c.R2, nr * rho), c.R1)
    ilamr, mvd_r, n0_r = _rain_psd(rr, jnp.maximum(nr_, c.R2))
    mvd_r = jnp.where(l_qr, mvd_r, 50.0e-6)

    l_qs = qs > c.R2
    rs = jnp.where(l_qs, qs * rho, c.R1)
    l_qg = qg > c.R2
    rg = jnp.where(l_qg, qg * rho, c.R1)

    # snow moments incl. the bm_s*2 reflectivity moment (f90:5033-5081)
    tc0 = jnp.minimum(-0.1, temp - 273.15)
    smob = rs * c.OAMS
    smoz = _field_moment(jnp.log10(jnp.maximum(smob, 1e-35)), tc0,
                         float(c.CSE[3]))

    # graupel N0 scan — reference refl variant keys on temp<270.65
    # (f90:5089), vs the solver's k>k_0; reproduce the refl variant
    kk = lax.iota(jnp.int32, nz)
    cold = (temp < 270.65) & l_qr & (mvd_r > 100.0e-6)
    xslw1 = jnp.where(cold, 4.01 + jnp.log10(mvd_r), 0.01)
    ygra1 = 4.31 + jnp.log10(jnp.maximum(5.0e-5, rg))
    zans1 = 3.1 + (100.0 / (300.0 * xslw1 * ygra1
                            / (10.0 / xslw1 + 1.0 + 0.25 * ygra1)
                            + 30.0 + 10.0 * ygra1))
    n0_exp = jnp.clip(jnp.power(10.0, zans1), c.GONV_MIN, c.GONV_MAX)
    n0_exp = lax.cummin(n0_exp, axis=n0_exp.ndim - 1, reverse=True)
    lam_exp = jnp.power(n0_exp * c.AM_G * CGG[1] / rg, c.OGE1)
    lamg = lam_exp * (CGG[3] * c.OGG2 * c.OGG1) ** c.OBMG
    ilamg = 1.0 / lamg
    n0_g = n0_exp / (CGG[2] * lam_exp) * jnp.power(lamg, CGE[2])

    ze_rain = jnp.where(l_qr,
                        n0_r * CRG[4] * jnp.power(ilamr, CRE[4]), 1.0e-22)
    ze_snow = jnp.where(l_qs,
                        (0.176 / 0.93) * (6.0 / c.PI) ** 2
                        * (c.AM_S / 900.0) ** 2 * smoz, 1.0e-22)
    ze_graupel = jnp.where(l_qg,
                           (0.176 / 0.93) * (6.0 / c.PI) ** 2
                           * (c.AM_G / 900.0) ** 2
                           * n0_g * CGG[4] * jnp.power(ilamg, CGE[4]),
                           1.0e-22)
    return 10.0 * jnp.log10((ze_rain + ze_snow + ze_graupel) * 1.0e18)
