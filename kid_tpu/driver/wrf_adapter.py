"""WRF/MPAS-shaped host adapter: the ``mp_gt_driver`` API (C13).

The reference keeps a 3-D (i,k,j) driver as the WRF-facing API
(module_mp_thompson09n.f90:806-1143; dead in KiD but kept as the
3-D-host-shaped reference interface).  This is its TPU-native twin:

  * accepts WRF-layout (i,k,j) arrays, flattens (i,j) into the batched
    column axis, runs the rank-polymorphic solver once, restores layout;
  * maintains the precip accumulators RAINNC/RAINNCV/SNOWNC/GRAUPELNC and
    the snow ratio SR (f90:979-993);
  * applies the negative-qv repair: negative vapor is replaced by the
    neighbor-level average, floored at 1e-7 (f90:1095-1106);
  * optional effective-radius diagnostics (f90:1109-1122).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import MicroConfig
from ..diag.moments import effective_radii
from ..micro import ColumnState, batched_microphysics
from ..tables.builders import Tables


class WrfPrecip(NamedTuple):
    rainnc: jnp.ndarray      # accumulated total precip (i, j)
    rainncv: jnp.ndarray     # this-step total precip (i, j)
    snownc: jnp.ndarray
    snowncv: jnp.ndarray
    graupelnc: jnp.ndarray
    graupelncv: jnp.ndarray
    sr: jnp.ndarray          # frozen-fraction "snow ratio" (i, j)


def _ikj_to_cols(a):
    """(i, k, j) -> (i*j, k)."""
    return jnp.moveaxis(a, 1, -1).reshape(-1, a.shape[1])


def _cols_to_ikj(a, ni, nj):
    return jnp.moveaxis(a.reshape(ni, nj, a.shape[-1]), -1, 1)


@partial(jax.jit, static_argnames=("cfg", "want_eff_rad", "dt"))
def mp_driver_3d(qv, qc, qr, qi, qs, qg, ni, nr, th, pii, p, w, dz,
                 dt, rainnc, snownc, graupelnc,
                 tables: Tables, cfg: MicroConfig,
                 want_eff_rad: bool = False):
    """One microphysics step on a WRF-shaped (i, k, j) tile.

    Args mirror mp_gt_driver's signature (f90:806-820): mixing ratios and
    numbers (i,k,j); ``th`` potential temperature; ``pii`` Exner; pressure,
    vertical velocity, layer thickness; accumulators (i,j).

    Returns (fields dict, WrfPrecip, optional effective radii dict).
    """
    ni_, nk, nj = qv.shape
    cols = _ikj_to_cols
    t_cols = cols(th) * cols(pii)                      # f90:937
    qv_c = cols(qv)
    rho = 0.622 * cols(p) / (287.04 * t_cols * (qv_c + 0.622))
    state = ColumnState(
        t=t_cols, qv=qv_c, qc=cols(qc), qi=cols(qi), qr=cols(qr),
        qs=cols(qs), qg=cols(qg), ni=cols(ni), nr=cols(nr),
        # non-aerosol-aware defaults (f90:957-964)
        nc=cfg.nt_c / rho, nwfa=11.1e6 / rho,
        nifa=0.5e6 * 0.01 / rho)
    out, ppt, _ = batched_microphysics(
        state, cols(p), cols(w), cols(dz), dt, tables, cfg)

    # negative-qv repair (f90:1095-1106): replace negative vapor with the
    # neighbor-level mean, floored at 1e-7
    qv_new = out.qv
    qv_up = jnp.concatenate([qv_new[:, 1:], qv_new[:, -1:]], axis=1)
    qv_dn = jnp.concatenate([qv_new[:, :1], qv_new[:, :-1]], axis=1)
    qv_fix = jnp.maximum(1.0e-7, 0.5 * (qv_up + qv_dn))
    qv_new = jnp.where(qv_new < 0.0, qv_fix, qv_new)

    fields = {
        "qv": _cols_to_ikj(qv_new, ni_, nj),
        "qc": _cols_to_ikj(out.qc, ni_, nj),
        "qr": _cols_to_ikj(out.qr, ni_, nj),
        "qi": _cols_to_ikj(out.qi, ni_, nj),
        "qs": _cols_to_ikj(out.qs, ni_, nj),
        "qg": _cols_to_ikj(out.qg, ni_, nj),
        "ni": _cols_to_ikj(out.ni, ni_, nj),
        "nr": _cols_to_ikj(out.nr, ni_, nj),
        "th": _cols_to_ikj(out.t, ni_, nj) / pii,
    }

    # precip accumulators (f90:979-993)
    shp = (ni_, nj)
    p_ra = ppt.rain.reshape(shp)
    p_sn = ppt.snow.reshape(shp)
    p_gr = ppt.graupel.reshape(shp)
    p_ic = ppt.ice.reshape(shp)
    rainncv = p_ra + p_sn + p_gr + p_ic
    precip = WrfPrecip(
        rainnc=rainnc + rainncv, rainncv=rainncv,
        snownc=snownc + p_sn + p_ic, snowncv=p_sn + p_ic,
        graupelnc=graupelnc + p_gr, graupelncv=p_gr,
        sr=(p_sn + p_gr + p_ic) / (rainncv + 1.0e-12))

    eff = None
    if want_eff_rad:
        re_qc, re_qi, re_qs = effective_radii(
            out.t, cols(p), qv_new, out.qc, out.nc, out.qi, out.ni,
            out.qs, cfg.nt_c, cfg.is_aerosol_aware)
        eff = {"re_cloud": _cols_to_ikj(jnp.clip(re_qc, 2.49e-6, 50.0e-6),
                                        ni_, nj),
               "re_ice": _cols_to_ikj(jnp.clip(re_qi, 4.99e-6, 125.0e-6),
                                      ni_, nj),
               "re_snow": _cols_to_ikj(jnp.clip(re_qs, 9.99e-6, 999.0e-6),
                                       ni_, nj)}
    return fields, precip, eff
