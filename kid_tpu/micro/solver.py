"""TPU-native Thompson09 column microphysics solver (L3, the hot path).

Re-implements the physics of ``mp_thompson`` (module_mp_thompson09n.f90:
1156-3688) as a pure, branch-free JAX function over one (nz,) column,
designed for ``jax.vmap`` over a batched (ncol, nz) state tensor:

  * every data-dependent ``if`` chain becomes masked arithmetic on safe
    placeholder values (the reference itself uses R1/R2 placeholders for
    absent species, which keeps all formulas finite);
  * the two sequential-in-k structures — the graupel-N0 running minimum
    (f90:1633-1656) and the "carry fallspeed down through empty layers"
    fills (f90:3234-3236 etc.) — become ``lax.cummin``/``lax.scan``;
  * the CFL-substepped sedimentation sweeps (f90:3365-3578) become a
    ``lax.fori_loop`` with a traced per-column trip count; within one
    substep the flux update is already parallel in k.

Phase numbering in comments follows SURVEY.md §3.2b.
"""
from __future__ import annotations

import math
import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .. import constants as c
from ..config import MicroConfig
from ..special import rslf, rsif
from .aerosol import activ_ncloud, eff_aero, ice_demott, ice_koop
from .fastmath import exp10, powc
from ..tables.builders import Tables
from ..tables.index import decade_index, fnint, log_bin_index, tnc_index
from .state import ColumnState, Precip

# Fortran 1-based gamma caches as python floats (weak-typed => no promotion).
CRE = tuple(float(x) for x in c.CRE)
CRG = tuple(float(x) for x in c.CRG)
CSE = tuple(float(x) for x in c.CSE)
CSG = tuple(float(x) for x in c.CSG)
CGE = tuple(float(x) for x in c.CGE)
CGG = tuple(float(x) for x in c.CGG)
CIE = tuple(float(x) for x in c.CIE)
CIG = tuple(float(x) for x in c.CIG)


# Stacking orders for the device-side table families.  Tables consumed with
# the SAME index tuple share ONE gather op per family instead of one per
# table (prof/prof_gather4.py: 11 separate 1M-index gathers cost 130 ms vs
# one family gather at 9-11 ms standalone).  Beyond stacking, the rain-snow
# and rain-graupel consumers (f90:1966-1995, 1999-2018) only ever read
# FIXED LINEAR COMBINATIONS of their tables — e.g. every branch of the
# rain<->snow rates uses (tmr_racs1+tcr_sacr1), (tmr_racs2+tcr_sacr2),
# (tcs_racs1+tms_sacr1), and tcs_racs2 is never read at all — so the
# combinations are pre-summed ONCE at init (in fp64, more accurate than
# the reference's per-cell f32 adds) and the gather fetches 5-per-cell
# instead of 11 (racs) and 4 instead of 5 (racg).  Measured at round 4:
# gather fusion cost scales with fetch width (4.45 ms for 11-wide vs
# 1.78 ms for 4-wide at 0.98M indices), so this is a ~3 ms/step saving.
_RACS = (("tmr_racs1", "tcr_sacr1"),      # ma: mass gained by graupel arm 1
         ("tmr_racs2", "tcr_sacr2"),      # mb: mass exchanged arm 2
         ("tcs_racs1", "tms_sacr1"),      # mc: snow-side collection arm 1
         ("tnr_racs1", "tnr_racs2", "tnr_sacr1", "tnr_sacr2"),  # n: cold
         ("tnr_racs2", "tnr_sacr2"))      # n: warm branch
                                          # index (idx_s, idx_t, idx_r1, idx_r)
_RACG = (("tmr_racg", "tcr_gacr"),        # cold: rain mass -> graupel
         ("tnr_racg", "tnr_gacr"),        # cold: rain number loss
         ("tnr_gacr",),                   # warm: break-up base (x -5)
         ("tcg_racg",))                   # warm: graupel melt-collect mass
                                          # index (idx_g1, idx_g, idx_r1, idx_r)
_QRFZ = ("tpg_qrfz", "tpi_qrfz", "tni_qrfz", "tnr_qrfz")
                                          # index (idx_r, idx_r1, idx_tc)
_QCFZ = ("tpi_qcfz", "tni_qcfz")          # index (idx_c, idx_tc)
_IAUS = ("tpi_ide", "tps_iaus", "tni_iaus")   # index (idx_i, idx_i1)


class DeviceTables(NamedTuple):
    """Device-resident lookup tables, re-laid-out for TPU gather efficiency
    (contents identical to the Fortran tables of f90:322-342; see Tables).

    Each family is a flat 2-D (n_tables, cells) FAMILY-MAJOR matrix
    gathered along axis 1 with a linear cell index computed in the solver.
    (Verified at HEAD, prof/prof_gather4.py: family-major 9.1 ms vs
    row-major (cells, n_tables) 10.1 ms for one 1M-index 11-wide gather —
    a real but small edge; the dominant effect is one gather op per
    family rather than per table.)"""

    racs: jax.Array    # (ntb_s*ntb_t*ntb_r1*ntb_r, 5) row-major, _RACS
    racg: jax.Array    # (ntb_g1*ntb_g*ntb_r1*ntb_r, 4) row-major, _RACG
    qrfz: jax.Array    # (ntb_r*ntb_r1*45, 4) row-major, order _QRFZ
    qcfz: jax.Array    # (2, ntb_c*45), order _QCFZ
    iaus: jax.Array    # (3, ntb_i*ntb_i1), order _IAUS
    t_efrw: jax.Array  # (nbr, nbc)
    t_efsw: jax.Array  # (nbs, nbc)
    tnc_wev: jax.Array  # (nbc, ntb_c, nbc)
    tnccn_act: jax.Array  # (7, 9, 7, 5, 4) CCN activation fraction
    # the 4 bilinear corners tnccn_act[{i-1,i},{j-1,j},k,2,1] pre-arranged
    # per flattened (i,j,k) so activ_ncloud is ONE exact one-hot MXU
    # fetch of a 4-wide row instead of 4 scattered 1M-index gathers
    # (measured ~3.4 ms EACH on a v5e; see aerosol.activ_ncloud)
    tnccn_corners: jax.Array  # (7*9*7, 4)


def device_tables(tables: Tables, dtype=jnp.float32) -> DeviceTables:
    """Re-layout host float64 tables into flat stacked device families.

    All casting/stacking happens host-side in NumPy so each family crosses
    to the device as ONE contiguous buffer (round-2 stacked on device via
    many small eager ops, costing ~31 s of H2D on the tunneled TPU)."""
    np_dtype = np.dtype(dtype.dtype if hasattr(dtype, "dtype") else dtype)

    def stack(names):
        s = np.stack([np.asarray(getattr(tables, n), np_dtype)
                      for n in names], axis=0)
        return jnp.asarray(s.reshape(s.shape[0], -1))

    def stack_rows(combos):
        # ROW-major (cells, k): one gather index fetches the whole
        # k-channel row from contiguous memory (one 64B line for k<=16).
        # Fixed consumer linear combinations pre-summed in fp64 (see the
        # _RACS/_RACG comment), cast once.
        s = np.stack([
            sum(np.asarray(getattr(tables, n), np.float64)
                for n in ([names] if isinstance(names, str) else names))
            for names in combos], axis=0).astype(np_dtype)
        return jnp.asarray(np.ascontiguousarray(
            s.reshape(s.shape[0], -1).T))

    return DeviceTables(
        racs=stack_rows(_RACS), racg=stack_rows(_RACG),
        qrfz=stack_rows(_QRFZ),
        qcfz=stack(_QCFZ), iaus=stack(_IAUS),
        t_efrw=jnp.asarray(np.asarray(tables.t_efrw, np_dtype)),
        t_efsw=jnp.asarray(np.asarray(tables.t_efsw, np_dtype)),
        tnc_wev=jnp.asarray(np.asarray(tables.tnc_wev, np_dtype)),
        tnccn_act=jnp.asarray(np.asarray(tables.tnccn_act, np_dtype)),
        tnccn_corners=jnp.asarray(
            _tnccn_corners(np.asarray(tables.tnccn_act, np.float64))
            .astype(np_dtype)))


def _tnccn_corners(act: np.ndarray) -> np.ndarray:
    """(ni*nj*nk, 4) corner rows [a, b, cc, dd] of the activation table's
    fixed (l=2, m=1) plane (f90:4502-4503), indexed by the CLIPPED
    (i, j, k) of aerosol.activ_ncloud: a=act[i-1,j-1,k], b=act[i,j-1,k],
    cc=act[i,j,k], dd=act[i-1,j,k].  Rows with i==0 or j==0 are never
    fetched (activ_ncloud clips both to >= 1); zeros there."""
    plane = act[:, :, :, 2, 1]                  # (ni, nj, nk)
    ni, nj, nk = plane.shape
    out = np.zeros((ni, nj, nk, 4))
    out[1:, 1:, :, 0] = plane[:-1, :-1, :]      # a
    out[1:, 1:, :, 1] = plane[1:, :-1, :]       # b
    out[1:, 1:, :, 2] = plane[1:, 1:, :]        # cc
    out[1:, 1:, :, 3] = plane[:-1, 1:, :]       # dd
    return out.reshape(ni * nj * nk, 4)


# nu_c-indexed gamma-coefficient columns [ccg1, ccg2, ccg3, ocg1, ocg2, cce2]
# (f90:452-490): fetched with ONE one-hot matmul per site instead of six
# scalar gathers (each scattered gather of an (ncol, nz) index field costs
# ~0.8 ms on a v5e; the one-hot contraction rides the MXU and is exact —
# every output element is value*1 plus zeros at HIGHEST precision).
_NUC_COEF = np.stack([c.CCG[1], c.CCG[2], c.CCG[3], c.OCG1, c.OCG2,
                      c.CCE[2]], axis=1)


def _rows(mat, idx):
    """Exact ``mat[idx]`` row lookup via one-hot contraction on the MXU."""
    oh = jax.nn.one_hot(idx, mat.shape[0], dtype=mat.dtype)
    return lax.dot_general(oh, mat, (((oh.ndim - 1,), (0,)), ((), ())),
                           precision=lax.Precision.HIGHEST)


def _lookup2d(tab, i0, i1):
    """Exact ``tab[i0, i1]`` for small 2-D tables via two one-hot
    contractions (the 100x100 tables are small enough that the one-hot
    matmuls ride the MXU instead of paying the ~10-cycle-per-index
    scattered-gather path)."""
    b = _rows(tab, i0)
    oh1 = jax.nn.one_hot(i1, tab.shape[1], dtype=tab.dtype)
    return jnp.sum(b * oh1, axis=-1)


def _relu(x):
    # Fortran idiom 0.5*((x)+abs(x)) used throughout (e.g. f90:1702,2098)
    return jnp.maximum(x, 0.0)


def _fill_down(vals, valid, kernel=False):
    """vt(k) = vt(k) if valid else vt(k+1), swept top->bottom with a zero
    upper boundary (f90:3234-3236, 3266-3268, 3306-3307, 3332-3333).

    Parallel formulation: "first valid value at-or-above k" is an
    associative suffix scan over (value, seen-valid) pairs — log-depth pure
    elementwise VPU work.  (The earlier index-gather formulation lowered to
    a scattered 1M-element TPU gather costing ~10 ms per call site.)

    ``kernel=True`` uses an explicit log-doubling of shifted selects (the
    same associative combine, unrolled) because ``lax.associative_scan``'s
    odd/even recursion lowers poorly under Mosaic; results are identical
    (the combine is exact selection, no arithmetic)."""
    if kernel:
        n = vals.shape[-1]
        v = vals
        # carry the seen-valid flag as 0/1 float: Mosaic cannot lane-shift
        # an i1 vreg (concatenate of bools dies in an invalid
        # tpu.bitcast_vreg i1->i32); max() is an exact OR on {0,1}
        f = valid.astype(vals.dtype)
        s = 1
        while s < n:
            # window [k, k+s) merged with [k+s, k+2s): take own when seen
            v2 = jnp.concatenate([v[..., s:], jnp.zeros_like(v[..., :s])],
                                 axis=-1)
            f2 = jnp.concatenate([f[..., s:], jnp.zeros_like(f[..., :s])],
                                 axis=-1)
            v = jnp.where(f > 0.5, v, v2)
            f = jnp.maximum(f, f2)
            s *= 2
        return jnp.where(f > 0.5, v, 0.0)

    def first_valid(a, b):
        # in a reversed scan the carry arrives as ``a`` (accumulated from
        # ABOVE) and the nearer element as ``b``: prefer b, so each level
        # keeps its own value when valid and takes the nearest one above
        # otherwise (verified against the Fortran recurrence; preferring a
        # floods the topmost valid value downward — the round-1 bug the
        # oracle caught).
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, av), af | bf

    v, f = lax.associative_scan(first_valid, (vals, valid),
                                axis=vals.ndim - 1, reverse=True)
    return jnp.where(f, v, 0.0)


def _cummin_rev(x, kernel=False):
    """Reversed (suffix) running minimum along the last axis
    (lax.cummin(..., reverse=True)).  ``kernel=True`` hand-rolls the
    log-doubling shifted-min (min is associative: bitwise-identical)."""
    if not kernel:
        return lax.cummin(x, axis=x.ndim - 1, reverse=True)
    n = x.shape[-1]
    big = jnp.full_like(x[..., :1], jnp.asarray(3.4e38, x.dtype))
    s = 1
    while s < n:
        shifted = jnp.concatenate(
            [x[..., s:], jnp.broadcast_to(big, x[..., :s].shape)], axis=-1)
        x = jnp.minimum(x, shifted)
        s *= 2
    return x


def _kiota(nz: int, kernel=False):
    """Level-index vector along the last axis; 2-D iota under Mosaic
    (TPU kernels reject 1-D iota)."""
    if kernel:
        return lax.broadcasted_iota(jnp.int32, (1, nz), 1)
    return lax.iota(jnp.int32, nz)


_SA = tuple(float(x) for x in c.SA)
_SB = tuple(float(x) for x in c.SB)


def _use_pallas(state, cfg) -> bool:
    """Gate for running phases 2-20 as ONE fused Pallas kernel
    (pallas_step.fused_step): ON BY DEFAULT on TPU for batched (ncol, nz)
    non-aerosol calls — the shipping configuration.  The kernel recomputes
    the whole prologue VMEM-resident from the raw state, so its HBM
    boundary is just the ~15 state/forcing channels plus the ~19
    table-stage channels (vs the ~70-channel boundary that sank the
    round-3 rates-only kernel, prof/README.md).

    Off for: CPU (inline XLA is the reference-equivalence path; Mosaic
    needs a TPU) and single-column (nz,) calls.  Aerosol-aware mode runs
    the SPLIT-kernel path (kernel A phases 2-11 -> XLA phase-14 lookups
    -> kernel B phases 12-20; the tnc_wev/activation gathers need the
    phase-12 provisional state, f90:2795-2851, so one kernel cannot
    cover them).  KID_TPU_PALLAS=0 forces inline everywhere; =1 forces
    the kernels (interpret-mode off TPU — slow, for tests)."""
    return pallas_enabled(cfg, state.qv.ndim)


def pallas_enabled(cfg, ndim: int = 2) -> bool:
    """Shared gate logic for the fused kernels (see ``_use_pallas``)."""
    import os
    mode = os.environ.get("KID_TPU_PALLAS", "auto")
    if mode == "0" or ndim != 2:
        return False
    if mode == "1":
        return True
    import jax
    return jax.default_backend() == "tpu"


def _field_ab(tc0, m: float):
    """Field et al. (2005) moment-regression coefficients (loga_, b_) at
    moment-order ``m`` (the pattern at f90:1556-1626 with static M)."""
    sa = _SA
    sb = _SB
    loga = (sa[0] + sa[1] * tc0 + sa[2] * m + sa[3] * tc0 * m
            + sa[4] * tc0 * tc0 + sa[5] * m * m + sa[6] * tc0 * tc0 * m
            + sa[7] * tc0 * m * m + sa[8] * tc0 ** 3 + sa[9] * m ** 3)
    b = (sb[0] + sb[1] * tc0 + sb[2] * m + sb[3] * tc0 * m
         + sb[4] * tc0 * tc0 + sb[5] * m * m + sb[6] * tc0 * tc0 * m
         + sb[7] * tc0 * m * m + sb[8] * tc0 ** 3 + sb[9] * m ** 3)
    return loga, b


def _field_moment(log10_smo2, tc0, m: float):
    # a_ * smo2**b_ == 10**(loga_ + b_*log10(smo2)): one exp per moment,
    # the log10 shared across the 5-7 moment orders of a phase.
    loga, b = _field_ab(tc0, m)
    return exp10(loga + b * log10_smo2)


def _snow_moments(rs, temp, l_qs, orders):
    """Snow moments via Field regression (f90:1545-1628).  bm_s == 2 so the
    reference moment smo2 == smob == rs/am_s.  Returns dict order->array,
    zero where not ``l_qs``."""
    tc0 = jnp.minimum(-0.1, temp - 273.15)
    smob = rs * c.OAMS
    smo2 = smob  # bm_s == 2 branch (f90:1553-1554)
    log10_smo2 = jnp.log(jnp.maximum(smo2, 1e-35)) * (1.0 / math.log(10.0))
    out = {"b": jnp.where(l_qs, smob, 0.0), "2": jnp.where(l_qs, smo2, 0.0)}
    for name, m in orders:
        out[name] = jnp.where(l_qs, _field_moment(log10_smo2, tc0, m), 0.0)
    return out


def _graupel_psd(rg, temp, l_qr, mvd_r, nz, kernel=False):
    """Graupel N0/lambda with the top-down running-min scan
    (f90:1633-1656) as a reversed cummin.  Rank-polymorphic over (..., nz)."""
    kk = _kiota(nz, kernel)
    # k_0: highest level with temp >= 270.65 (f90:1635-1637), default kts
    k0 = jnp.max(jnp.where(temp >= 270.65, kk, 0), axis=-1, keepdims=True)
    xslw1 = jnp.where((kk > k0) & l_qr & (mvd_r > 100.0e-6),
                      4.01 + jnp.log10(jnp.maximum(mvd_r, 1e-12)), 0.01)
    ygra1 = 4.31 + jnp.log10(jnp.maximum(5.0e-5, rg))
    zans1 = 3.1 + (100.0 / (300.0 * xslw1 * ygra1
                            / (10.0 / xslw1 + 1.0 + 0.25 * ygra1)
                            + 30.0 + 10.0 * ygra1))
    n0_exp = jnp.clip(exp10(zans1), c.GONV_MIN, c.GONV_MAX)
    # running minimum swept from the top (f90:1648-1649)
    n0_exp = _cummin_rev(n0_exp, kernel)
    lam_exp = powc(n0_exp * c.AM_G * CGG[1] / rg, c.OGE1)
    lamg = lam_exp * (CGG[3] * c.OGG2 * c.OGG1) ** c.OBMG
    ilamg = 1.0 / lamg
    n0_g = n0_exp / (CGG[2] * lam_exp) * powc(lamg, CGE[2])
    return ilamg, n0_g


def _rain_psd(rr, nr):
    """Rain slope/intercept for every level (f90:1661-1666); the reference
    runs this on the R1/R2 placeholders too, so no masking is needed."""
    lamr = powc(c.AM_R * CRG[3] * c.ORG2 * nr / rr, c.OBMR)
    ilamr = 1.0 / lamr
    mvd_r = (3.0 + c.MU_R + 0.672) / lamr
    n0_r = nr * c.ORG2 * powc(lamr, CRE[2])
    return ilamr, mvd_r, n0_r


def _thermo(temp, pres, qv):
    """Common thermodynamic functions (f90:1503-1533, 2574-2595)."""
    tempc = temp - 273.15
    rho = 0.622 * pres / (c.R_GAS * temp * (qv + 0.622))
    rhof = jnp.sqrt(c.RHO_NOT / rho)
    rhof2 = jnp.sqrt(rhof)
    qvs = rslf(pres, temp)
    diffu = 2.11e-5 * powc(temp / 273.15, 1.94) * (101325.0 / pres)
    visco = jnp.where(
        tempc >= 0.0,
        (1.718 + 0.0049 * tempc) * 1.0e-5,
        (1.718 + 0.0049 * tempc - 1.2e-5 * tempc * tempc) * 1.0e-5)
    ocp = 1.0 / (c.CP * (1.0 + 0.887 * qv))
    vsc2 = jnp.sqrt(rho / visco)
    lvap = c.LVAP0 + (2106.0 - 4218.0) * tempc
    tcond = (5.69 + 0.0168 * tempc) * 1.0e-5 * 418.936
    return rho, rhof, rhof2, qvs, diffu, visco, ocp, vsc2, lvap, tcond


def _subl_prefactor(temp, qvsi, rho, diffu, tcond, ssati, lheat, two_pi):
    """Srivastava & Coen (1992) ventilation/thermo prefactor
    (f90:1883-1900 for sublimation, :2819-2822 for evaporation)."""
    otemp = 1.0 / temp
    rvs = rho * qvsi
    base = lheat * otemp * c.ORV - 1.0
    rvs_p = rvs * otemp * base
    rvs_pp = rvs * (otemp * base * otemp * base
                    + (-2.0 * lheat * otemp ** 3 * c.ORV) + otemp * otemp)
    gamsc = lheat * diffu / tcond * rvs_p
    alphsc = jnp.maximum(
        1.0e-9, 0.5 * (gamsc / (1.0 + gamsc)) ** 2 * rvs_pp / rvs_p
        * rvs / rvs_p)
    xsat = jnp.where(jnp.abs(ssati) < 1.0e-9, 0.0, ssati)
    t1 = two_pi * (1.0 - alphsc * xsat
                   + 2.0 * alphsc * alphsc * xsat * xsat
                   - 5.0 * alphsc ** 3 * xsat ** 3) / (1.0 + gamsc)
    return t1, rvs


# table axis first-values used by the index guards
_RC1 = float(c.R_C_AXIS[0])
_RI1 = float(c.R_I_AXIS[0])
_RR1 = float(c.R_R_AXIS[0])
_RS1 = float(c.R_S_AXIS[0])
_RG1 = float(c.R_G_AXIS[0])
_NTI1 = float(c.NT_I_AXIS[0])
_NTIN1 = float(c.NT_IN_AXIS[0])
_DR1 = float(c.DR_BINS[0])
_DRN = float(c.DR_BINS[-1])
_DS1 = float(c.DS_BINS[0])
_DSN = float(c.DS_BINS[-1])


def _nr_from_mvd(rr_, mvd):
    lam = (3.0 + c.MU_R + 0.672) / mvd
    return CRG[2] * c.ORG3 * rr_ * powc(lam, c.BM_R) / c.AM_R


def _lookup2d_family(fam, n0, n1, i0, i1, dtype):
    """Exact ``fam[:, i0*n1 + i1]`` for a stacked family ``fam`` of shape
    (k, n0*n1) via two one-hot contractions: a row fetch on the MXU plus a
    lane-select sum.  Bitwise-identical to the gather (one-hot rows are
    exactly one 1.0), ~5x cheaper per index than the scattered-gather path
    for these small tables (prof/README.md gather cost model)."""
    k = fam.shape[0]
    rows = fam.reshape(k, n0, n1).transpose(1, 2, 0).reshape(n0, n1 * k)
    b = _rows(rows, i0).reshape(i0.shape + (n1, k))
    oh1 = jax.nn.one_hot(i1, n1, dtype=dtype)
    out = jnp.sum(b * oh1[..., None], axis=-2)          # (..., k)
    return jnp.moveaxis(out, -1, 0)                     # (k, ...)


# Static capacity (levels) of the active-band window for the three
# scattered family gathers; 0 disables banding.  See _banded_gather.
_GATHER_KBAND = int(os.environ.get("KID_TPU_GATHER_KBAND", "64"))


def _banded_gather(table, lin, mask, kband: int):
    """Family-table gather restricted to the tightest k-band that contains
    every True of ``mask`` (the consumers' own activity test — the
    reference guards the same blocks per cell, e.g. ``if (L_qr(k) .and.
    L_qs(k))`` at f90:1961/1999/2065).

    TPU scattered gathers cost ~10 cycles per INDEX regardless of fetch
    width (prof/README.md), and in the KiD cases the rain∧snow,
    rain∧graupel and subfreezing-rain masks live in a narrow contiguous
    band of levels (the mixed-phase/melting layer).  Slicing a
    static-capacity window around that band first (``lax.dynamic_slice``
    — a bulk vector copy, not a per-index op) cuts the gather's index
    count by ~nz/kband.  Window cells outside the mask gather harmlessly
    (every consumer rate is ``where``-masked by the same condition);
    outside the window the rows are zeros, masked identically.  When the
    band is wider than the window the full gather runs instead
    (``lax.cond``), so consumed results match the unbanded path bitwise
    in all regimes.

    Returns a TUPLE of per-channel (..., nz) arrays (not a stacked
    (..., nz, nch) tensor): consumers read individual channels, and a
    channel-minor 3-D materialization costs ~4 ms of layout traffic
    (measured; see the per-channel dus note below)."""
    nz = lin.shape[-1]
    nch = table.shape[-1]
    if kband <= 0 or nz <= kband:
        rows = table[lin]
        return tuple(rows[..., j] for j in range(nch))
    act = jnp.any(mask, axis=tuple(range(mask.ndim - 1)))      # (nz,)
    k0 = jnp.argmax(act).astype(jnp.int32)
    k1 = (nz - jnp.argmax(act[::-1])).astype(jnp.int32)
    width = jnp.where(jnp.any(act), k1 - k0, 0)
    zero = jnp.zeros((), jnp.int32)          # match s0 dtype under x64
    lead = (zero,) * (lin.ndim - 1)

    def banded(_):
        s0 = jnp.minimum(k0, nz - kband)     # dynamic_slice's own clamp
        lin_b = lax.dynamic_slice(lin, lead + (s0,),
                                  lin.shape[:-1] + (kband,))
        rows_b = table[lin_b]                # (..., kband, nch)
        # scatter-back PER CHANNEL on 2-D state-layout arrays: a single
        # 3-D dus makes XLA materialize the zeros in a channel-minor
        # {2,1,0} layout (measured 0.8 ms broadcast + 2.8 ms dus + 0.7 ms
        # relayout copy for qrfz); per-channel (ncol, nz) dus on the
        # natural {1,0} layout is cheap
        full = jnp.zeros(lin.shape, table.dtype)
        return tuple(lax.dynamic_update_slice(full, rows_b[..., j],
                                              lead + (s0,))
                     for j in range(nch))

    def unbanded(_):
        rows = table[lin]
        return tuple(rows[..., j] for j in range(nch))

    return lax.cond(width <= kband, banded, unbanded, None)


def _banded_lookup2d(tab, i0, i1, mask, kband: int):
    """Banded variant of ``_lookup2d`` (same contract as
    ``_banded_gather``: zeros outside the window, full lookup when the
    band overflows).  The one-hot MXU dot cost scales with cell count,
    so restricting it to the active k-band scales it by kband/nz.

    ``mask`` must be a SUPERSET of the consumer's own activity test;
    callers widen threshold-based masks (mvd>D0 etc.) by a slack factor
    because the fused kernel re-derives those thresholds in Mosaic
    arithmetic that may differ from XLA's by ulps."""
    nz = i0.shape[-1]
    if kband <= 0 or nz <= kband:
        return _lookup2d(tab, i0, i1)
    act = jnp.any(mask, axis=tuple(range(mask.ndim - 1)))
    k0 = jnp.argmax(act).astype(jnp.int32)
    k1 = (nz - jnp.argmax(act[::-1])).astype(jnp.int32)
    width = jnp.where(jnp.any(act), k1 - k0, 0)
    zero = jnp.zeros((), jnp.int32)
    lead = (zero,) * (i0.ndim - 1)

    def banded(_):
        s0 = jnp.minimum(k0, nz - kband)
        i0b = lax.dynamic_slice(i0, lead + (s0,),
                                i0.shape[:-1] + (kband,))
        i1b = lax.dynamic_slice(i1, lead + (s0,),
                                i1.shape[:-1] + (kband,))
        v = _lookup2d(tab, i0b, i1b)
        return lax.dynamic_update_slice(
            jnp.zeros(i0.shape, tab.dtype), v, lead + (s0,))

    return lax.cond(width <= kband, banded,
                    lambda _: _lookup2d(tab, i0, i1), None)


def _banded_lookup2d_family(fam, n0, n1, i0, i1, mask, kband: int,
                            dtype):
    """Banded variant of ``_lookup2d_family`` (k channels first)."""
    nz = i0.shape[-1]
    if kband <= 0 or nz <= kband:
        return _lookup2d_family(fam, n0, n1, i0, i1, dtype)
    act = jnp.any(mask, axis=tuple(range(mask.ndim - 1)))
    k0 = jnp.argmax(act).astype(jnp.int32)
    k1 = (nz - jnp.argmax(act[::-1])).astype(jnp.int32)
    width = jnp.where(jnp.any(act), k1 - k0, 0)
    zero = jnp.zeros((), jnp.int32)
    lead = (zero,) * (i0.ndim - 1)

    def banded(_):
        s0 = jnp.minimum(k0, nz - kband)
        i0b = lax.dynamic_slice(i0, lead + (s0,),
                                i0.shape[:-1] + (kband,))
        i1b = lax.dynamic_slice(i1, lead + (s0,),
                                i1.shape[:-1] + (kband,))
        v = _lookup2d_family(fam, n0, n1, i0b, i1b, dtype)  # (k, ..., kb)
        full = jnp.zeros(i0.shape, dtype)
        return jnp.stack([lax.dynamic_update_slice(full, v[j],
                                                   lead + (s0,))
                          for j in range(fam.shape[0])])

    return lax.cond(width <= kband, banded,
                    lambda _: _lookup2d_family(fam, n0, n1, i0, i1,
                                               dtype), None)


def _rows_const(mat, idx, dtype):
    """Exact ``mat[idx]`` row lookup for a small HOST (numpy) matrix via an
    unrolled select chain — gather- and dot-free, so it lowers cleanly
    inside a Pallas kernel (the one-hot MXU form of ``_rows`` needs a 3-D
    dot_general that Mosaic does not take)."""
    rows = [tuple(float(v) for v in r) for r in np.asarray(mat)]
    outs = []
    for j in range(len(rows[0])):
        accj = jnp.full(idx.shape, rows[0][j], dtype)
        for k in range(1, len(rows)):
            accj = jnp.where(idx == k, jnp.asarray(rows[k][j], dtype), accj)
        outs.append(accj)
    return outs


def _nuc_rows(nu_c, dtype, kernel=False):
    """The 6 nu_c-indexed gamma-coefficient columns of ``_NUC_COEF``
    [ccg1, ccg2, ccg3, ocg1, ocg2, cce2] — one-hot MXU fetch inline,
    select chain inside a Mosaic kernel (no 3-D dot_general there)."""
    if kernel:
        return _rows_const(_NUC_COEF, nu_c, dtype)
    cf = _rows(jnp.asarray(_NUC_COEF, dtype), nu_c)
    return [cf[..., j] for j in range(6)]


# input channel names for the phase 8-11 rates block; base channels feed
# the warm physics, ice channels exist only when ``not cfg.iiwarm``, aero
# channels only in aerosol-aware mode.  The gathered table-family values
# (rv/gv/fv/cv/iv, ef_rw/ef_sw) are computed by the caller, so the block
# itself is PURE ELEMENTWISE code — runnable as plain jnp or VMEM-resident
# inside one fused Pallas kernel (pallas_step.py).
P8_BASE = ("temp", "qv", "qc1d", "nc1d", "qi1d", "ni1d", "qr1d", "nr1d",
           "qs1d", "qg1d", "rho", "rc", "nc", "ri", "ni", "rr", "nr",
           "rs", "rg", "rhof", "rhof2", "qvs", "qvsi", "delqvs", "ssatw",
           "ssati", "diffu", "visco", "vsc2", "ocp", "lvap", "tcond",
           "ilamr", "mvd_r", "n0_r", "mvd_c", "xdc", "lamc", "dc_g",
           "nu_c_f", "ef_rw")
P8_ICE = ("smo0", "smo1", "smob", "smoc", "smoe", "smof", "ilamg", "n0_g",
          "xds", "ef_sw", "ilami", "xdi", "oxmi", "tide",
          "prr_rcs", "prs_rcs", "prg_rcs", "pnr_rcs", "prg_rcg",
          "prr_rcg", "pnr_rcg", "prg_rfz", "pri_rfz", "pni_rfz",
          "pnr_rfz", "pri_wfz", "pni_wfz", "prs_iau", "pni_iau")
P8_AERO = ("nwfa", "nifa")
P8_OUT = ("tten", "qvten", "qcten", "ncten", "qiten", "niten", "qrten",
          "nrten", "qsten", "qgten", "nwfaten", "nifaten", "vts_boost",
          "mvd_r_new", "prr_gml")
P8_RATES = ('prr_wau', 'prr_rcw', 'pnr_wau', 'pnr_rcr', 'pri_inu', 'pri_ide', 'prs_ide', 'prs_sde', 'prg_gde', 'pri_wfz', 'prs_scw', 'prg_scw', 'prg_gcw', 'pri_ihm', 'pri_rfz', 'prs_iau', 'prs_sci', 'pri_rci', 'pni_inu', 'pni_ihm', 'pni_wfz', 'pni_rfz', 'pni_ide', 'pni_iau', 'pni_sci', 'pni_rci', 'prr_sml', 'pnr_rcs', 'pnr_rcg', 'pnr_rci', 'pnr_sml', 'pnr_gml', 'pnr_rfz')


def rates_and_tendencies(pro, cfg, dt_f, want_rates=True):
    """Phases 8-11 of mp_thompson (f90:1676-2569): the ~45 process rates,
    conservation ratio-clamps and tendency assembly, as one pure
    elementwise function of the prologue products in ``pro``.

    Table lookups happen in the CALLER (per-cell gathers of the stacked
    families + the Efrw/Efsw 2-D lookups); this function is gather-free so
    the whole block can run VMEM-resident inside one Pallas kernel.
    Returns a dict with P8_OUT keys (+ P8_RATES when ``want_rates``).
    """
    dtype = pro["qv"].dtype
    one = jnp.asarray(1.0, dtype)
    dt = jnp.asarray(dt_f, dtype)
    odt = one / dt
    odts = odt
    nt_c = cfg.nt_c
    z = jnp.zeros_like(pro["qv"])

    temp = pro["temp"]; qv = pro["qv"]
    qc1d = pro["qc1d"]; nc1d = pro["nc1d"]; qi1d = pro["qi1d"]
    ni1d = pro["ni1d"]; qr1d = pro["qr1d"]; nr1d = pro["nr1d"]
    qs1d = pro["qs1d"]; qg1d = pro["qg1d"]
    rho = pro["rho"]; rc = pro["rc"]; nc = pro["nc"]; ri = pro["ri"]
    ni = pro["ni"]; rr = pro["rr"]; nr = pro["nr"]; rs = pro["rs"]
    rg = pro["rg"]
    rhof = pro["rhof"]; rhof2 = pro["rhof2"]; qvs = pro["qvs"]
    qvsi = pro["qvsi"]; delqvs = pro["delqvs"]; ssatw = pro["ssatw"]
    ssati = pro["ssati"]; diffu = pro["diffu"]; visco = pro["visco"]
    vsc2 = pro["vsc2"]; ocp = pro["ocp"]; lvap = pro["lvap"]
    tcond = pro["tcond"]
    ilamr = pro["ilamr"]; mvd_r = pro["mvd_r"]; n0_r = pro["n0_r"]
    mvd_c = pro["mvd_c"]; xdc = pro["xdc"]; lamc = pro["lamc"]
    dc_g = pro["dc_g"]; ef_rw = pro["ef_rw"]
    nu_c = pro["nu_c_f"]            # float; .astype(dtype) is a no-op
    tempc = temp - 273.15
    l_qc = qc1d > c.R1
    l_qi = qi1d > c.R1
    l_qr = qr1d > c.R1
    l_qs = qs1d > c.R1
    l_qg = qg1d > c.R1
    if not cfg.iiwarm:
        smo0 = pro["smo0"]; smo1 = pro["smo1"]; smob = pro["smob"]
        smoc = pro["smoc"]; smoe = pro["smoe"]; smof = pro["smof"]
        ilamg = pro["ilamg"]; n0_g = pro["n0_g"]; xds = pro["xds"]
        ef_sw = pro["ef_sw"]
        # rates whose table-family gathers (and short arithmetic) stay in
        # the XLA prologue so the gathers keep their consumer fusions
        prr_rcs = pro["prr_rcs"]; prs_rcs = pro["prs_rcs"]
        prg_rcs = pro["prg_rcs"]; pnr_rcs = pro["pnr_rcs"]
        prg_rcg = pro["prg_rcg"]; prr_rcg = pro["prr_rcg"]
        pnr_rcg = pro["pnr_rcg"]
        prg_rfz = pro["prg_rfz"]; pri_rfz = pro["pri_rfz"]
        pni_rfz = pro["pni_rfz"]; pnr_rfz = pro["pnr_rfz"]
        pri_wfz = pro["pri_wfz"]; pni_wfz = pro["pni_wfz"]
        prs_iau = pro["prs_iau"]; pni_iau = pro["pni_iau"]
    else:
        prr_rcs = prs_rcs = prg_rcs = pnr_rcs = z
        prg_rcg = prr_rcg = pnr_rcg = z
        prg_rfz = pri_rfz = pni_rfz = pnr_rfz = z
        pri_wfz = pni_wfz = prs_iau = pni_iau = z
    if cfg.is_aerosol_aware:
        nwfa = pro["nwfa"]; nifa = pro["nifa"]

    # ---- phase 8: warm-rain process rates (f90:1676-1742) -----------------
    # rain self-collection + Verlinde-Cotton breakup (f90:1680-1686)
    ef_rr = 1.0 - jnp.exp(jnp.minimum(2300.0 * (mvd_r - 1950.0e-6), 50.0))
    pnr_rcr = jnp.where(l_qr & (mvd_r > c.D0R), ef_rr * 2.0 * nr * rr, 0.0)

    # Berry & Reinhardt autoconversion (f90:1698-1712)
    au = rc > 0.01e-3
    dc_b = powc(_relu(xdc ** 3 * dc_g ** 3 - xdc ** 6), 1.0 / 6.0)
    zeta1 = _relu(6.25e-6 * xdc * dc_b ** 3 - 0.4)
    zeta = 0.027 * rc * zeta1
    taud = _relu(0.5 * dc_b - 7.5) + c.R1
    tau = 3.72 / (rc * taud)
    prr_wau = jnp.where(au, jnp.minimum(rc * odts, zeta / tau), 0.0)
    pnr_wau = jnp.where(au, prr_wau / (c.AM_R * nu_c.astype(dtype)
                                       * c.D0R ** 3), 0.0)
    pnc_wau = jnp.where(au, jnp.minimum(nc * odts,
                                        prr_wau / (c.AM_R * mvd_c ** 3)), 0.0)

    # rain collecting cloud water via t_Efrw (f90:1715-1726)
    rcw = l_qr & (mvd_r > c.D0R) & (mvd_c > c.D0C)
    lamr = 1.0 / ilamr
    geo_r = powc(lamr + c.FV_R, -CRE[9])
    prr_rcw = jnp.where(
        rcw, jnp.minimum(rc * odts,
                         rhof * c.T1_QR_QC * ef_rw * rc * n0_r * geo_r), 0.0)
    pnc_rcw = jnp.where(
        rcw, jnp.minimum(nc * odts,
                         rhof * c.T1_QR_QC * ef_rw * nc * n0_r * geo_r), 0.0)

    # rain collecting aerosols, wet scavenging (f90:1728-1740); only feeds
    # nwfa/nifa tendencies, which exist solely in aerosol-aware mode
    pna_rca = z; pnd_rcd = z; pna_sca = z; pnd_scd = z
    pna_gca = z; pnd_gcd = z
    if cfg.is_aerosol_aware:
        rca_on = l_qr & (mvd_r > c.D0R)
        ef_ra = eff_aero(mvd_r, 0.04e-6, visco, rho, temp, "r")
        pna_rca = jnp.where(rca_on, jnp.minimum(
            nwfa * odts, rhof * c.T1_QR_QC * ef_ra * nwfa * n0_r * geo_r),
            0.0)
        ef_rd = eff_aero(mvd_r, 0.8e-6, visco, rho, temp, "r")
        pnd_rcd = jnp.where(rca_on, jnp.minimum(
            nifa * odts, rhof * c.T1_QR_QC * ef_rd * nifa * n0_r * geo_r),
            0.0)

    # ---- phase 9: ice-phase process rates (f90:1749-2286) -----------------
    pnc_scw = z; pnc_gcw = z
    pri_inu = z; pni_inu = z; pri_ihm = z; pni_ihm = z
    pri_ide = z; pni_ide = z; prs_ide = z
    pri_rci = z; pni_rci = z; prr_rci = z; pnr_rci = z; prg_rci = z
    pni_sci = z; prs_sci = z
    pri_iha = z; pni_iha = z
    prs_sde = z; prs_scw = z; prs_ihm = z
    prg_scw = z; prg_gde = z; prg_gcw = z
    prg_ihm = z
    prr_sml = z; pnr_sml = z; prr_gml = z; pnr_gml = z
    vts_boost = jnp.full_like(qv, 1.5)

    if not cfg.iiwarm:
        t_lt_0 = temp < c.T_0
        vts_boost = jnp.where(t_lt_0, 1.0, 1.5)      # f90:1751,2027

        # sublimation/deposition prefactor (f90:1883-1900)
        t1_subl, rvs_i = _subl_prefactor(temp, qvsi, rho, diffu, tcond,
                                         ssati, c.LSUB, 4.0 * c.PI)

        # snow collecting cloud water via t_Efsw (f90:1902-1913)
        scw = l_qc & (mvd_c > c.D0C) & (xds > c.D0S)
        prs_scw = jnp.where(scw, rhof * c.T1_QS_QC * ef_sw * rc * smoe, 0.0)
        pnc_scw = jnp.where(
            scw, jnp.minimum(nc * odts,
                             rhof * c.T1_QS_QC * ef_sw * nc * smoe), 0.0)

        # graupel collecting cloud water (f90:1915-1935); nested in L_qc
        xdg = (c.BM_G + c.MU_G + 1.0) * ilamg
        # ilamg^bv_g computed once; every other graupel exponent in this
        # block is bv_g plus an integer/half-integer (cge(9)=bv_g+3,
        # cge(11)=(bv_g+5)/2), so the whole family costs ONE pow.
        g_bvg = powc(ilamg, c.BV_G)
        g_cge9 = g_bvg * powc(ilamg, 3.0)
        g_cge11 = jnp.sqrt(g_bvg * powc(ilamg, 5.0))
        vtg_loc = rhof * c.AV_G * CGG[6] * c.OGG3 * g_bvg
        stoke_g = mvd_c * mvd_c * vtg_loc * c.RHO_W / (9.0 * visco * xdg)
        ef_gw = jnp.where(
            stoke_g >= 0.4,
            jnp.where(stoke_g <= 10.0,
                      0.55 * jnp.log10(2.51 * stoke_g), 0.77),
            0.0)
        gcw = (l_qc & (mvd_c > c.D0C) & (rg >= _RG1) & (xdg > c.D0G))
        geo_g = g_cge9
        prg_gcw = jnp.where(gcw, rhof * c.T1_QG_QC * ef_gw * rc
                            * n0_g * geo_g, 0.0)
        pnc_gcw = jnp.where(
            gcw, jnp.minimum(nc * odts, rhof * c.T1_QG_QC * ef_gw * nc
                             * n0_g * geo_g), 0.0)

        # snow/graupel collecting aerosols, wet scavenging (f90:1937-1959)
        if cfg.is_aerosol_aware:
            sca_on = rs > _RS1
            xds_s = smoc / jnp.maximum(smob, 1e-30)
            ef_sa = eff_aero(xds_s, 0.04e-6, visco, rho, temp, "s")
            pna_sca = jnp.where(sca_on, jnp.minimum(
                nwfa * odts, rhof * c.T1_QS_QC * ef_sa * nwfa * smoe), 0.0)
            ef_sd = eff_aero(xds_s, 0.8e-6, visco, rho, temp, "s")
            pnd_scd = jnp.where(sca_on, jnp.minimum(
                nifa * odts, rhof * c.T1_QS_QC * ef_sd * nifa * smoe), 0.0)
            gca_on = rg > _RG1
            ef_ga = eff_aero(xdg, 0.04e-6, visco, rho, temp, "g")
            pna_gca = jnp.where(gca_on, jnp.minimum(
                nwfa * odts,
                rhof * c.T1_QG_QC * ef_ga * nwfa * n0_g * geo_g), 0.0)
            ef_gd = eff_aero(xdg, 0.8e-6, visco, rho, temp, "g")
            pnd_gcd = jnp.where(gca_on, jnp.minimum(
                nifa * odts,
                rhof * c.T1_QG_QC * ef_gd * nifa * n0_g * geo_g), 0.0)



        # ---------- processes only below 0C (f90:2025-2231) ----------------
        rate_max_i = (qv - qvsi) * rho * odts * 0.999   # f90:2028

        # deposition-condensation ice nucleation: DeMott (2010) when
        # dusty+aerosol-aware, else the Cooper curve (f90:2088-2101)
        inu = t_lt_0 & ((ssati >= 0.25) | ((ssatw > c.EPS)
                                           & (temp < 253.15)))
        if cfg.is_aerosol_aware and cfg.dusty_ice:
            xnc_inu = ice_demott(tempc, qv, qvs, qvsi, rho, nifa)
        else:
            xnc_inu = jnp.minimum(250.0e3, c.TNO
                                  * jnp.exp(c.ATO * (c.T_0 - temp)))
        xni_now = ni + (pni_rfz + pni_wfz) * dt
        pni_inu0 = 0.5 * (xnc_inu - xni_now
                          + jnp.abs(xnc_inu - xni_now)) * odts
        pri_inu = jnp.where(inu, jnp.minimum(rate_max_i,
                                             c.XM0I * pni_inu0), 0.0)
        pni_inu = jnp.where(inu, pri_inu / c.XM0I, 0.0)

        # Koop (2001) homogeneous freezing of deliquesced aerosols
        # (f90:2103-2111); aerosol-aware + homog_ice only.
        if cfg.is_aerosol_aware and cfg.homog_ice:
            xni_koop = smo0 + ni + (pni_rfz + pni_wfz + pni_inu) * dt
            iha_on = (t_lt_0 & (xni_koop <= 500.0e3) & (temp < 238.0)
                      & (ssati >= 0.4))
            xnc_iha = ice_koop(temp, qv, qvs, nwfa, dt)
            pni_iha0 = xnc_iha * odts
            pri_iha = jnp.where(
                iha_on, jnp.minimum(rate_max_i, c.XM0I * 0.1 * pni_iha0),
                0.0)
            pni_iha = jnp.where(iha_on, pri_iha / (c.XM0I * 0.1), 0.0)

        # cloud-ice deposition/sublimation (f90:2115-2133)
        ilami = pro["ilami"]
        xdi = pro["xdi"]
        oxmi = pro["oxmi"]
        ide0 = (c.C_CUBE * t1_subl * diffu * ssati * rvs_i
                * c.OIG1 * CIG[5] * ni * ilami)
        ide_neg = jnp.maximum(jnp.maximum(-ri * odts, ide0), rate_max_i)
        pni_ide_neg = jnp.maximum(-ni * odts, ide_neg * oxmi)
        ide_pos = jnp.minimum(ide0, rate_max_i)
        tide = pro["tide"]
        ice_on = t_lt_0 & l_qi
        pri_ide = jnp.where(ice_on,
                            jnp.where(ide0 < 0.0, ide_neg, tide * ide_pos),
                            0.0)
        pni_ide = jnp.where(ice_on & (ide0 < 0.0), pni_ide_neg, 0.0)
        prs_ide = jnp.where(ice_on & (ide0 >= 0.0),
                            (1.0 - tide) * ide_pos, 0.0)

        # snow deposition/sublimation (f90:2151-2164)
        c_snow = jnp.clip(c.C_SQRD + (tempc + 1.5) * (c.C_CUBE - c.C_SQRD)
                          / (-30.0 + 1.5), c.C_SQRD, c.C_CUBE)
        sde0 = (c_snow * t1_subl * diffu * ssati * rvs_i
                * (c.T1_QS_SD * smo1 + c.T2_QS_SD * rhof2 * vsc2 * smof))
        prs_sde_cold = jnp.where(
            sde0 < 0.0, jnp.maximum(jnp.maximum(-rs * odts, sde0),
                                    rate_max_i),
            jnp.minimum(sde0, rate_max_i))
        prs_sde = jnp.where(t_lt_0 & l_qs, prs_sde_cold, 0.0)

        # graupel sublimation (cold branch requires ssati < -eps, f90:2166-2175)
        gde0 = (c.C_CUBE * t1_subl * diffu * ssati * rvs_i * n0_g
                * (c.T1_QG_SD * powc(ilamg, CGE[10])
                   + c.T2_QG_SD * vsc2 * rhof2 * g_cge11))
        gde_lim = jnp.where(gde0 < 0.0,
                            jnp.maximum(jnp.maximum(-rg * odts, gde0),
                                        rate_max_i),
                            jnp.minimum(gde0, rate_max_i))
        prg_gde = jnp.where(t_lt_0 & l_qg & (ssati < -c.EPS), gde_lim, 0.0)

        # snow collecting cloud ice (f90:2177-2187)
        sci_on = ice_on & (rs >= _RS1)
        prs_sci = jnp.where(sci_on,
                            c.T1_QS_QI * rhof * c.EF_SI * ri * smoe, 0.0)
        pni_sci = jnp.where(sci_on, prs_sci * oxmi, 0.0)

        # rain collecting cloud ice -> graupel (f90:2189-2201)
        rci_on = ice_on & (rr >= _RR1) & (mvd_r > 4.0 * xdi)
        pri_rci = jnp.where(rci_on, rhof * c.T1_QR_QI * c.EF_RI * ri
                            * n0_r * geo_r, 0.0)
        pnr_rci = jnp.where(rci_on, rhof * c.T1_QR_QI * c.EF_RI * ni
                            * n0_r * geo_r, 0.0)
        pni_rci = jnp.where(rci_on, pri_rci * oxmi, 0.0)
        prr_rci = jnp.where(
            rci_on,
            jnp.minimum(rr * odts, rhof * c.T2_QR_QI * c.EF_RI * ni * n0_r
                        * powc(lamr + c.FV_R, -CRE[8])), 0.0)
        prg_rci = jnp.where(rci_on, pri_rci + prr_rci, 0.0)

        # Hallett-Mossop rime splintering (f90:2204-2218)
        hm_on = t_lt_0 & (prg_gcw > c.EPS) & (tempc > -8.0)
        tf = jnp.where((tempc >= -5.0) & (tempc < -3.0),
                       0.5 * (-3.0 - tempc),
                       jnp.where((tempc > -8.0) & (tempc < -5.0),
                                 0.33333333 * (8.0 + tempc), 0.0))
        pni_ihm = jnp.where(hm_on, 3.5e8 * tf * prg_gcw, 0.0)
        pri_ihm = jnp.where(hm_on, c.XM0I * pni_ihm, 0.0)
        hm_den = jnp.maximum(prs_scw + prg_gcw, 1e-30)
        prs_ihm = jnp.where(hm_on, prs_scw / hm_den * pri_ihm, 0.0)
        prg_ihm = jnp.where(hm_on, prg_gcw / hm_den * pri_ihm, 0.0)

        # rimed snow -> graupel split + fallspeed boost (f90:2220-2231)
        conv = t_lt_0 & (prs_scw > 2.0 * prs_sde) & (prs_sde > c.EPS)
        r_frac = jnp.minimum(30.0, prs_scw / jnp.maximum(prs_sde, 1e-30))
        g_frac = jnp.minimum(0.95, 0.15 + (r_frac - 2.0) * 0.028)
        vts_boost = jnp.where(conv,
                              jnp.minimum(1.5, 1.1 + (r_frac - 2.0) * 0.016),
                              vts_boost)
        prg_scw = jnp.where(conv, g_frac * prs_scw, 0.0)
        prs_scw = jnp.where(conv, (1.0 - g_frac) * prs_scw, prs_scw)

        # ---------- melting branch, T >= T_0 (f90:2235-2281) ----------------
        melt = ~t_lt_0
        sml0 = ((tempc * tcond - c.LVAP0 * diffu * delqvs)
                * (c.T1_QS_ME * smo1 + c.T2_QS_ME * rhof2 * vsc2 * smof))
        sml = jnp.minimum(rs * odts,
                          jnp.maximum(0.0, sml0 + 4218.0 * c.OLFUS * tempc
                                      * (prr_rcs + prs_scw)))
        prr_sml = jnp.where(melt & l_qs, sml, 0.0)
        pnr_sml = jnp.where(
            melt & l_qs,
            jnp.minimum(smo0 * odts,
                        smo0 / jnp.maximum(rs, c.R1) * prr_sml
                        * exp10(-0.25 * tempc)), 0.0)
        # subsaturated snow in the melting layer sublimates (f90:2247-2252)
        prs_sde = jnp.where(melt & l_qs & (ssati < 0.0),
                            jnp.maximum(-rs * odts,
                                        c.C_CUBE * t1_subl * diffu * ssati
                                        * rvs_i
                                        * (c.T1_QS_SD * smo1 + c.T2_QS_SD
                                           * rhof2 * vsc2 * smof)),
                            prs_sde)
        gml0 = ((tempc * tcond - c.LVAP0 * diffu * delqvs) * n0_g
                * (c.T1_QG_ME * powc(ilamg, CGE[10])
                   + c.T2_QG_ME * rhof2 * vsc2 * g_cge11))
        prr_gml = jnp.where(melt & l_qg,
                            jnp.minimum(rg * odts, jnp.maximum(0.0, gml0)),
                            0.0)
        pnr_gml = jnp.where(
            melt & l_qg,
            n0_g * CGG[2] * powc(ilamg, CGE[2])
            / jnp.maximum(rg, c.R1) * prr_gml
            * exp10(-0.5 * tempc), 0.0)
        prg_gde = jnp.where(melt & l_qg & (ssati < 0.0),
                            jnp.maximum(-rg * odts, gde0), prg_gde)
        # long-timestep riming reroute (f90:2277-2281)
        long_dt = melt & (dt > 120.0)
        prr_rcw = jnp.where(long_dt, prr_rcw + prs_scw + prg_gcw, prr_rcw)
        prs_scw = jnp.where(long_dt, 0.0, prs_scw)
        prg_gcw = jnp.where(long_dt, 0.0, prg_gcw)

    # ---- phase 10: conservation ratio-clamps (f90:2291-2387) --------------
    def _scale(cond, ratio, *rates):
        return tuple(jnp.where(cond, r * ratio, r) for r in rates)

    # vapor deposition group
    sump = pri_inu + pri_ide + prs_ide + prs_sde + prg_gde + pri_iha
    rate_max = (qv - qvsi) * odts * 0.999
    bad = (((sump > c.EPS) & (sump > rate_max))
           | ((sump < -c.EPS) & (sump < rate_max)))
    ratio = rate_max / jnp.where(bad, sump, one)
    (pri_inu, pri_ide, pni_ide, prs_ide, prs_sde, prg_gde,
     pri_iha) = _scale(bad, ratio, pri_inu, pri_ide, pni_ide, prs_ide,
                       prs_sde, prg_gde, pri_iha)

    # cloud water
    sump = -prr_wau - pri_wfz - prr_rcw - prs_scw - prg_scw - prg_gcw
    rate_max = -rc * odts
    bad = (sump < rate_max) & l_qc
    ratio = rate_max / jnp.where(bad, sump, one)
    (prr_wau, pri_wfz, prr_rcw, prs_scw, prg_scw,
     prg_gcw) = _scale(bad, ratio, prr_wau, pri_wfz, prr_rcw, prs_scw,
                       prg_scw, prg_gcw)

    # cloud ice
    sump = pri_ide - prs_iau - prs_sci - pri_rci
    rate_max = -ri * odts
    bad = (sump < rate_max) & l_qi
    ratio = rate_max / jnp.where(bad, sump, one)
    (pri_ide, prs_iau, prs_sci,
     pri_rci) = _scale(bad, ratio, pri_ide, prs_iau, prs_sci, pri_rci)

    # rain
    sump = -prg_rfz - pri_rfz - prr_rci + prr_rcs + prr_rcg
    rate_max = -rr * odts
    bad = (sump < rate_max) & l_qr
    ratio = rate_max / jnp.where(bad, sump, one)
    (prg_rfz, pri_rfz, prr_rci, prr_rcs,
     prr_rcg) = _scale(bad, ratio, prg_rfz, pri_rfz, prr_rci, prr_rcs,
                       prr_rcg)

    # snow
    sump = prs_sde - prs_ihm - prr_sml + prs_rcs
    rate_max = -rs * odts
    bad = (sump < rate_max) & l_qs
    ratio = rate_max / jnp.where(bad, sump, one)
    (prs_sde, prs_ihm, prr_sml,
     prs_rcs) = _scale(bad, ratio, prs_sde, prs_ihm, prr_sml, prs_rcs)

    # graupel
    sump = prg_gde - prg_ihm - prr_gml + prg_rcg
    rate_max = -rg * odts
    bad = (sump < rate_max) & l_qg
    ratio = rate_max / jnp.where(bad, sump, one)
    (prg_gde, prg_ihm, prr_gml,
     prg_rcg) = _scale(bad, ratio, prg_gde, prg_ihm, prr_gml, prg_rcg)

    # symmetry re-enforcement (f90:2375-2385)
    pri_ihm = prs_ihm + prg_ihm
    pair = jnp.minimum(jnp.abs(prr_rcg), jnp.abs(prg_rcg))
    prr_rcg = pair * jnp.sign(prr_rcg)
    prg_rcg = -prr_rcg
    warm_lvl = temp > c.T_0
    pair = jnp.minimum(jnp.abs(prr_rcs), jnp.abs(prs_rcs))
    prr_rcs = jnp.where(warm_lvl, pair * jnp.sign(prr_rcs), prr_rcs)
    prs_rcs = jnp.where(warm_lvl, -prr_rcs, prs_rcs)

    # ---- phase 11: tendency assembly + number clamps (f90:2393-2569) ------
    orho = 1.0 / rho
    lfus2 = c.LSUB - lvap

    qvten = (-pri_inu - pri_iha - pri_ide - prs_ide - prs_sde
             - prg_gde) * orho
    qcten = (-prr_wau - pri_wfz - prr_rcw - prs_scw - prg_scw
             - prg_gcw) * orho
    ncten = (-pnc_wau - pnc_rcw - pni_wfz - pnc_scw - pnc_gcw) * orho

    # cloud mass/number balance (f90:2428-2448); note the reference uses the
    # OLD rc in the lamc denominator at :2432 — reproduced.
    xrc = jnp.maximum(c.R1, (qc1d + qcten * dt) * rho)
    xnc = jnp.maximum(2.0, (nc1d + ncten * dt) * rho)
    nu_c = jnp.minimum(15, fnint(1000.0e6 / xnc) + 2).astype(jnp.int32)
    ccg1_n, ccg2_n, _u3, ocg1_n, ocg2_n, cce2_n = _rows_const(
        _NUC_COEF, nu_c, dtype)
    lamc = powc(xnc * c.AM_R * ccg2_n * ocg1_n / rc, c.OBMR)
    xdc = (c.BM_R + nu_c.astype(dtype) + 1.0) / lamc
    lamc_lo = cce2_n / c.D0C
    lamc_hi = cce2_n / (c.D0R * 2.0)
    xnc_lo = ccg1_n * ocg2_n * xrc / c.AM_R * powc(lamc_lo, c.BM_R)
    xnc_hi = ccg1_n * ocg2_n * xrc / c.AM_R * powc(lamc_hi, c.BM_R)
    ncten = jnp.where(
        xrc > c.R1,
        jnp.where(xdc < c.D0C, (xnc_lo - nc1d * rho) * odts * orho,
                  jnp.where(xdc > c.D0R * 2.0,
                            (xnc_hi - nc1d * rho) * odts * orho, ncten)),
        -nc1d * odts)
    xnc = jnp.maximum(0.0, (nc1d + ncten * dt) * rho)
    ncten = jnp.where(xnc > c.NT_C_MAX,
                      (c.NT_C_MAX - nc1d * rho) * odts * orho, ncten)

    qiten = (pri_inu + pri_iha + pri_ihm + pri_wfz + pri_rfz + pri_ide
             - prs_iau - prs_sci - pri_rci) * orho
    niten = (pni_inu + pni_iha + pni_ihm + pni_wfz + pni_rfz + pni_ide
             - pni_iau - pni_sci - pni_rci) * orho

    # ice mass/number balance (f90:2464-2484)
    xri = jnp.maximum(c.R1, (qi1d + qiten * dt) * rho)
    xni = jnp.maximum(c.R2, (ni1d + niten * dt) * rho)
    lami = powc(c.AM_I * CIG[2] * c.OIG1 * xni / xri, c.OBMI)
    xdi = (c.BM_I + c.MU_I + 1.0) / lami
    xni_lo = jnp.minimum(499.0e3, CIG[1] * c.OIG2 * xri / c.AM_I
                         * powc(CIE[2] / 5.0e-6, c.BM_I))
    xni_hi = (CIG[1] * c.OIG2 * xri / c.AM_I
              * powc(CIE[2] / 300.0e-6, c.BM_I))
    niten = jnp.where(
        xri > c.R1,
        jnp.where(xdi < 5.0e-6, (xni_lo - ni1d * rho) * odts * orho,
                  jnp.where(xdi > 300.0e-6,
                            (xni_hi - ni1d * rho) * odts * orho, niten)),
        -ni1d * odts)
    xni = jnp.maximum(0.0, (ni1d + niten * dt) * rho)
    niten = jnp.where(xni > 499.0e3,
                      (499.0e3 - ni1d * rho) * odts * orho, niten)

    qrten = (prr_wau + prr_rcw + prr_sml + prr_gml + prr_rcs + prr_rcg
             - prg_rfz - pri_rfz - prr_rci) * orho
    nrten = (pnr_wau + pnr_sml + pnr_gml
             - (pnr_rfz + pnr_rcr + pnr_rcg + pnr_rcs + pnr_rci)) * orho

    # rain mass/number balance (f90:2515-2534)
    xrr = jnp.maximum(c.R1, (qr1d + qrten * dt) * rho)
    xnr = jnp.maximum(c.R2, (nr1d + nrten * dt) * rho)
    lamr_b = powc(c.AM_R * CRG[3] * c.ORG2 * xnr / xrr, c.OBMR)
    mvd_b = (3.0 + c.MU_R + 0.672) / lamr_b
    xnr_hi = _nr_from_mvd(xrr, 2.5e-3)
    xnr_lo = _nr_from_mvd(xrr, c.D0R * 0.75)
    has_rain_after = (qr1d + qrten * dt) * rho > c.R1
    nrten = jnp.where(
        has_rain_after,
        jnp.where(mvd_b > 2.5e-3, (xnr_hi - nr1d * rho) * odts * orho,
                  jnp.where(mvd_b < c.D0R * 0.75,
                            (xnr_lo - nr1d * rho) * odts * orho, nrten)),
        -nr1d * odts)
    qrten = jnp.where(has_rain_after, qrten, -qr1d * odts)
    mvd_r = jnp.where(has_rain_after, jnp.clip(mvd_b, c.D0R * 0.75, 2.5e-3),
                      mvd_r)

    qsten = (prs_iau + prs_sde + prs_sci + prs_scw + prs_rcs + prs_ide
             - prs_ihm - prr_sml) * orho
    qgten = (prg_scw + prg_rfz + prg_gde + prg_rcg + prg_gcw + prg_rci
             + prg_rcs - prg_ihm - prr_gml) * orho

    # temperature tendency split by T (f90:2550-2567)
    ifdry = float(1 - cfg.ifdry)
    tten_cold = (c.LSUB * ocp * (pri_inu + pri_ide + prs_ide + prs_sde
                                 + prg_gde + pri_iha)
                 + lfus2 * ocp * (pri_wfz + pri_rfz + prg_rfz + prs_scw
                                  + prg_scw + prg_gcw + prg_rcs + prs_rcs
                                  + prr_rci + prg_rcg)) * orho * ifdry
    tten_warm = (c.LFUS * ocp * (-prr_sml - prr_gml - prr_rcg - prr_rcs)
                 + c.LSUB * ocp * (prs_sde + prg_gde)) * orho * ifdry
    tten = jnp.where(temp < c.T_0, tten_cold, tten_warm)

    # aerosol tendencies (only evolve in aerosol-aware mode; f90:2398-2408)
    if cfg.is_aerosol_aware:
        nwfaten = -(pna_rca + pna_sca + pna_gca + pni_iha) * orho
        if cfg.dusty_ice:
            nifaten = (-(pnd_rcd + pnd_scd + pnd_gcd) - pni_inu) * orho
        else:
            nifaten = z
    else:
        nwfaten = z
        nifaten = z + 0.0


    out = dict(tten=tten, qvten=qvten, qcten=qcten, ncten=ncten,
               qiten=qiten, niten=niten, qrten=qrten, nrten=nrten,
               qsten=qsten, qgten=qgten, nwfaten=nwfaten, nifaten=nifaten,
               vts_boost=vts_boost, mvd_r_new=mvd_r, prr_gml=prr_gml)
    if want_rates:
        loc = locals()
        for k in P8_RATES:
            out[k] = loc[k]
    return out


def _prologue(state: ColumnState, pres, cfg: MicroConfig, kernel=False,
              want_idx=True):
    """Phases 2-7 of mp_thompson (f90:1387-1666) plus the PSD shapes and
    lookup-table indices of the phase 8-9 prologue (f90:1688-1694,
    1753-1881): pure table-free math (elementwise + the graupel-N0 suffix
    cummin), shared verbatim between the inline XLA path and the fused
    Pallas kernel (which recomputes it VMEM-resident from the raw state —
    ``kernel=True`` swaps the three Mosaic-hostile formulations: one-hot
    dot_general row fetch, lax.cummin, 1-D iota).

    Returns (pro, idx): ``pro`` holds the P8_BASE/P8_ICE input channels
    this stage can produce (everything except the table-lookup values and
    their consumer rates, which ``_table_stage`` adds), ``idx`` the
    integer lookup indices (empty when ``want_idx=False`` — the kernel
    never gathers)."""
    nz = state.qv.shape[-1]
    dtype = state.qv.dtype
    nt_c = cfg.nt_c
    z = jnp.zeros_like(state.qv)

    t1d, qv1d = state.t, state.qv
    qc1d, qi1d, qr1d = state.qc, state.qi, state.qr
    qs1d, qg1d = state.qs, state.qg
    ni1d, nr1d, nc1d = state.ni, state.nr, state.nc
    nwfa1d, nifa1d = state.nwfa, state.nifa

    # ---- phase 2: load column, presence flags, PSD sanity clamps ----------
    # (f90:1387-1493)
    temp = t1d
    qv = jnp.maximum(1.0e-10, qv1d)
    rho = 0.622 * pres / (c.R_GAS * temp * (qv + 0.622))
    orho0 = 1.0 / rho
    nwfa = jnp.clip(nwfa1d * rho, 11.1e6, 9999.0e6)
    nifa = jnp.clip(nifa1d * rho, c.NA_IN1 * 0.01, 9999.0e6)

    # cloud water (f90:1395-1418)
    l_qc = qc1d > c.R1
    qc1d = jnp.where(l_qc, qc1d, 0.0)
    nc1d = jnp.where(l_qc, nc1d, 0.0)
    rc = jnp.where(l_qc, qc1d * rho, c.R1)
    nc_raw = jnp.maximum(2.0, nc1d * rho)
    nu_c = jnp.minimum(15, fnint(1000.0e6 / nc_raw) + 2).astype(jnp.int32)
    ccg1_n, ccg2_n, _u, ocg1_n, ocg2_n, cce2_n = _nuc_rows(nu_c, dtype,
                                                           kernel)
    lamc = powc(nc_raw * c.AM_R * ccg2_n * ocg1_n / rc, c.OBMR)
    xdc = (c.BM_R + nu_c.astype(dtype) + 1.0) / lamc
    lamc = jnp.where(xdc < c.D0C, cce2_n / c.D0C,
                     jnp.where(xdc > c.D0R * 2.0, cce2_n / (c.D0R * 2.0),
                               lamc))
    nc_cl = jnp.minimum(c.NT_C_MAX,
                        ccg1_n * ocg2_n * rc / c.AM_R
                        * powc(lamc, c.BM_R))
    if not cfg.is_aerosol_aware:
        nc_cl = jnp.full_like(nc_cl, nt_c)        # f90:1410
    nc = jnp.where(l_qc, nc_cl, 2.0)

    # cloud ice (f90:1420-1445)
    l_qi = qi1d > c.R1
    qi1d = jnp.where(l_qi, qi1d, 0.0)
    ni1d = jnp.where(l_qi, ni1d, 0.0)
    ri = jnp.where(l_qi, qi1d * rho, c.R1)
    ni0 = jnp.maximum(c.R2, ni1d * rho)
    ni_fix = jnp.minimum(499.0e3, CIG[1] * c.OIG2 * ri / c.AM_I
                         * powc(CIE[2] / 25.0e-6, c.BM_I))
    ni1 = jnp.where(ni1d * rho <= c.R2, ni_fix, ni0)
    lami = powc(c.AM_I * CIG[2] * c.OIG1 * ni1 / ri, c.OBMI)
    xdi = (c.BM_I + c.MU_I + 1.0) / lami
    ni2 = jnp.where(
        xdi < 5.0e-6,
        jnp.minimum(499.0e3, CIG[1] * c.OIG2 * ri / c.AM_I
                    * powc(CIE[2] / 5.0e-6, c.BM_I)),
        jnp.where(xdi > 300.0e-6,
                  CIG[1] * c.OIG2 * ri / c.AM_I
                  * powc(CIE[2] / 300.0e-6, c.BM_I),
                  ni1))
    ni = jnp.where(l_qi, ni2, c.R2)

    # rain (f90:1447-1474)
    l_qr = qr1d > c.R1
    qr1d = jnp.where(l_qr, qr1d, 0.0)
    nr1d = jnp.where(l_qr, nr1d, 0.0)
    rr = jnp.where(l_qr, qr1d * rho, c.R1)
    nr0 = jnp.maximum(c.R2, nr1d * rho)

    nr1 = jnp.where(nr1d * rho <= c.R2, _nr_from_mvd(rr, 1.0e-3), nr0)
    lamr = powc(c.AM_R * CRG[3] * c.ORG2 * nr1 / rr, c.OBMR)
    mvd0 = (3.0 + c.MU_R + 0.672) / lamr
    nr2 = jnp.where(mvd0 > 2.5e-3, _nr_from_mvd(rr, 2.5e-3),
                    jnp.where(mvd0 < c.D0R * 0.75,
                              _nr_from_mvd(rr, c.D0R * 0.75), nr1))
    nr = jnp.where(l_qr, nr2, c.R2)
    mvd_r = jnp.where(l_qr, jnp.clip(mvd0, c.D0R * 0.75, 2.5e-3), c.D0C)

    # snow / graupel (f90:1475-1492)
    l_qs = qs1d > c.R1
    qs1d = jnp.where(l_qs, qs1d, 0.0)
    rs = jnp.where(l_qs, qs1d * rho, c.R1)
    l_qg = qg1d > c.R1
    qg1d = jnp.where(l_qg, qg1d, 0.0)
    rg = jnp.where(l_qg, qg1d * rho, c.R1)

    # ---- phase 3: thermodynamics (f90:1503-1533) --------------------------
    tempc = temp - 273.15
    rhof = jnp.sqrt(c.RHO_NOT / rho)
    rhof2 = jnp.sqrt(rhof)
    qvs = rslf(pres, temp)
    delqvs = jnp.maximum(0.0, rslf(pres, jnp.full_like(temp, 273.15)) - qv)
    qvsi = jnp.where(tempc <= 0.0, rsif(pres, temp), qvs)
    satw = qv / qvs
    sati = qv / qvsi
    ssatw = satw - 1.0
    ssati = sati - 1.0
    ssatw = jnp.where(jnp.abs(ssatw) < c.EPS, 0.0, ssatw)
    ssati = jnp.where(jnp.abs(ssati) < c.EPS, 0.0, ssati)
    diffu = 2.11e-5 * powc(temp / 273.15, 1.94) * (101325.0 / pres)
    visco = jnp.where(tempc >= 0.0,
                      (1.718 + 0.0049 * tempc) * 1.0e-5,
                      (1.718 + 0.0049 * tempc - 1.2e-5 * tempc ** 2) * 1.0e-5)
    ocp = 1.0 / (c.CP * (1.0 + 0.887 * qv))
    vsc2 = jnp.sqrt(rho / visco)
    lvap = c.LVAP0 + (2106.0 - 4218.0) * tempc
    tcond = (5.69 + 0.0168 * tempc) * 1.0e-5 * 418.936

    # ---- phase 5: snow moments (f90:1545-1628) ----------------------------
    if not cfg.iiwarm:
        sm = _snow_moments(rs, temp, l_qs,
                           [("0", 0.0), ("1", 1.0), ("c", CSE[1]),
                            ("e", CSE[13]), ("f", CSE[16])])
        smo0, smo1, smob = sm["0"], sm["1"], sm["b"]
        smoc, smoe, smof = sm["c"], sm["e"], sm["f"]
    else:
        smo0 = smo1 = smob = smoc = smoe = smof = z

    # ---- phase 6: graupel PSD with running-min N0 scan (f90:1633-1656) ----
    if not cfg.iiwarm:
        ilamg, n0_g = _graupel_psd(rg, temp, l_qr, mvd_r, nz, kernel)
    else:
        ilamg, n0_g = z + 1.0, z

    # ---- phase 7: rain PSD (f90:1661-1666) --------------------------------
    ilamr, mvd_r, n0_r = _rain_psd(rr, nr)

    # ---- phases 8-11 prologue: PSD shapes + lookup indices ----------------
    # cloud mvd (f90:1688-1694); nu_c/lamc recomputed from current nc
    nu_c = jnp.minimum(15, fnint(1000.0e6 / nc) + 2).astype(jnp.int32)
    ccg1_n, ccg2_n, ccg3_n, ocg1_n, ocg2_n, _u = _nuc_rows(nu_c, dtype,
                                                           kernel)
    xdc = jnp.maximum(c.D0C * 1.0e6,
                      powc(rc / (c.AM_R * nc), c.OBMR) * 1.0e6)
    lamc = powc(nc * c.AM_R * ccg2_n * ocg1_n / rc, c.OBMR)
    mvd_c = jnp.where(l_qc, (3.0 + nu_c.astype(dtype) + 0.672) / lamc, c.D0C)
    dc_g = powc(ccg3_n * ocg2_n, c.OBMR) / lamc * 1.0e6
    idx = {}
    if want_idx:
        idx["rw"] = log_bin_index(jnp.maximum(mvd_r, _DR1), _DR1, _DRN,
                                  c.NBR)
        idx["cw"] = jnp.clip((mvd_c * 1.0e6).astype(jnp.int32), 1,
                             c.NBC) - 1

    pro = dict(temp=temp, qv=qv, qc1d=qc1d, nc1d=nc1d, qi1d=qi1d,
               ni1d=ni1d, qr1d=qr1d, nr1d=nr1d, qs1d=qs1d, qg1d=qg1d,
               rho=rho, rc=rc, nc=nc, ri=ri, ni=ni, rr=rr, nr=nr, rs=rs,
               rg=rg, rhof=rhof, rhof2=rhof2, qvs=qvs, qvsi=qvsi,
               delqvs=delqvs, ssatw=ssatw, ssati=ssati, diffu=diffu,
               visco=visco, vsc2=vsc2, ocp=ocp, lvap=lvap, tcond=tcond,
               ilamr=ilamr, mvd_r=mvd_r, n0_r=n0_r, mvd_c=mvd_c, xdc=xdc,
               lamc=lamc, dc_g=dc_g, nu_c_f=nu_c.astype(dtype))
    if cfg.is_aerosol_aware:
        pro.update(nwfa=nwfa, nifa=nifa)

    if not cfg.iiwarm:
        xds = jnp.where(l_qs, smoc / jnp.maximum(smob, 1e-30), 0.0)
        # cloud-ice PSD shape for the ide/iau/sci/rci rates (f90:2115-2201)
        lami = powc(c.AM_I * CIG[2] * c.OIG1 * ni / ri, c.OBMI)
        ilami = 1.0 / lami
        xdi = jnp.maximum(c.D0I, (c.BM_I + c.MU_I + 1.0) * ilami)
        xmi = c.AM_I * powc(xdi, c.BM_I)
        oxmi = 1.0 / xmi
        pro.update(smo0=smo0, smo1=smo1, smob=smob, smoc=smoc, smoe=smoe,
                   smof=smof, ilamg=ilamg, n0_g=n0_g, xds=xds,
                   ilami=ilami, xdi=xdi, oxmi=oxmi)
        if want_idx:
            # temperature / species table indices (f90:1753-1881, 2050-2062)
            idx["tc"] = jnp.clip(fnint(-tempc).astype(jnp.int32), 1, 45) - 1
            idx_t0 = ((tempc - 2.5) / 5.0).astype(jnp.int32) - 1
            idx["t"] = jnp.clip(jnp.maximum(1, -idx_t0), 1, c.NTB_T) - 1
            has_r = rr > _RR1
            has_g = rg > _RG1
            lam_exp_r = (1.0 / ilamr) * (CRG[3] * c.ORG2 * c.ORG1) ** c.BM_R
            n0_exp_r = c.ORG1 * rr / c.AM_R * powc(lam_exp_r, CRE[1])
            lam_exp_g = (1.0 / ilamg) * (CGG[3] * c.OGG2 * c.OGG1) ** c.BM_G
            n0_exp_g = c.OGG1 * rg / c.AM_G * powc(lam_exp_g, CGE[1])

            # all 8 decade indices in ONE stacked call so the log10/pow
            # chain runs once over an (8, ...) stack instead of
            # fragmenting into 8 small kernel groups.
            stack = jnp.stack([rc, ri, ni, rr, n0_exp_r, rs, rg, n0_exp_g])
            shp = (8,) + (1,) * (state.qv.ndim)
            n2v = jnp.asarray([c.NIC2, c.NII2, c.NII3, c.NIR2, c.NIR3,
                               c.NIS2, c.NIG2, c.NIG3],
                              jnp.int32).reshape(shp)
            ntbv = jnp.asarray([c.NTB_C, c.NTB_I, c.NTB_I1, c.NTB_R,
                                c.NTB_R1, c.NTB_S, c.NTB_G, c.NTB_G1],
                               jnp.int32).reshape(shp)
            idx8 = decade_index(stack, n2v, ntbv)
            idx["c"] = jnp.where(rc > _RC1, idx8[0], 0)
            idx["i"] = jnp.where(ri > _RI1, idx8[1], 0)
            idx["i1"] = jnp.where(ni > _NTI1, idx8[2], 0)
            idx["r"] = jnp.where(has_r, idx8[3], 0)
            idx["r1"] = jnp.where(has_r, idx8[4], c.NTB_R1 - 1)
            idx["s"] = jnp.where(rs > _RS1, idx8[5], 0)
            idx["g"] = jnp.where(has_g, idx8[6], 0)
            idx["g1"] = jnp.where(has_g, idx8[7], c.NTB_G1 - 1)
            idx["sw"] = log_bin_index(jnp.maximum(xds, _DS1), _DS1, _DSN,
                                      c.NBS)
    return pro, idx


def _table_stage(pro, idx, tables: DeviceTables, cfg: MicroConfig,
                 dt_f: float):
    """Table lookups and their consumer rates (f90:1715-1726, 1902-1913,
    1961-2018, 2065-2086, 2135-2148), kept in plain XLA so each scattered
    family gather retains its consumer fusion (prof/README.md: hoisting a
    gather's consumers strips the fusion and roughly doubles its cost).

    Returns the ``tv`` channel dict — the ONLY table-derived values the
    rest of the step needs: ef_rw/ef_sw plus the 16 finished rate channels
    and tide.  These are what the fused Pallas kernel receives across its
    boundary (~19 channels instead of the ~70 of the round-3 design)."""
    dtype = pro["qv"].dtype
    one = jnp.asarray(1.0, dtype)
    odts = one / jnp.asarray(float(dt_f), dtype)   # dtsave == dt
    nt_c = cfg.nt_c
    temp = pro["temp"]
    rc = pro["rc"]; nc = pro["nc"]; ri = pro["ri"]; ni = pro["ni"]
    rr = pro["rr"]; nr = pro["nr"]; rs = pro["rs"]; rg = pro["rg"]

    # ef_rw/ef_sw banded by slack-widened supersets of their consumer
    # masks (rcw at solver.py:607, scw at :654; 0.999 threshold slack
    # because the fused kernel re-derives mvd_c/mvd_r/xds in Mosaic
    # arithmetic) — see _banded_lookup2d.  In warm-only mode ef_rw is
    # the ONLY table op and banding it measured a net LOSS (warm1_recon
    # 2.30M -> 1.97M col-steps/s: the cond/any/dus overhead exceeds the
    # ~0.2 ms dot saving), so iiwarm keeps the plain lookup.
    if cfg.iiwarm:
        return {"ef_rw": _lookup2d(tables.t_efrw, idx["rw"], idx["cw"])}
    rcw_band = ((pro["qr1d"] > 0.5 * c.R1) & (pro["mvd_r"] > 0.999 * c.D0R)
                & (pro["mvd_c"] > 0.999 * c.D0C))
    tv = {"ef_rw": _banded_lookup2d(tables.t_efrw, idx["rw"], idx["cw"],
                                    rcw_band, _GATHER_KBAND)}

    scw_band = ((pro["qc1d"] > 0.5 * c.R1) & (pro["mvd_c"] > 0.999 * c.D0C)
                & (pro["xds"] > 0.999 * c.D0S))
    ef_sw = _banded_lookup2d(tables.t_efsw, idx["sw"], idx["cw"],
                             scw_band, _GATHER_KBAND // 2)
    idx_r = idx["r"]; idx_r1 = idx["r1"]; idx_tc = idx["tc"]
    # activity masks (identical to the consumers' where-conditions below)
    # drive the banded family gathers — see _banded_gather
    t_lt_0 = temp < c.T_0
    rs_on = (rr >= _RR1) & (rs >= _RS1)
    rg_on = (rr >= _RR1) & (rg >= _RG1)
    frz_tab = t_lt_0 & (rr > _RR1)
    # gathered rows stay (..., k); consumers slice the trailing axis so
    # XLA fuses the channel extraction instead of materializing a
    # transpose (a moveaxis here cost ~0.7 ms of relayout copies)
    lin_s = ((idx["s"] * c.NTB_T + idx["t"]) * c.NTB_R1 + idx_r1) \
        * c.NTB_R + idx_r
    # per-family static windows sized from the measured case bands
    # (prof/prof_bands.py: racs <= 10, racg <= 33, qrfz <= 36 levels
    # across mixed1/deep1/aerosol1d) with ~1.5x headroom; the lax.cond
    # fallback keeps any regime outside these windows exact
    rv = _banded_gather(tables.racs, lin_s, rs_on, _GATHER_KBAND // 4)
    lin_g = ((idx["g1"] * c.NTB_G + idx["g"]) * c.NTB_R1 + idx_r1) \
        * c.NTB_R + idx_r
    # 48-level windows: 40 measured SLOWER (mixed1 ~595k vs ~700-800k
    # col-steps/s — a 40-lane dynamic slice loses the fast sub-tile
    # path that 48/64 widths hit); do not shrink below 48
    gv = _banded_gather(tables.racg, lin_g, rg_on, _GATHER_KBAND * 3 // 4)
    fv = _banded_gather(
        tables.qrfz, (idx_r * c.NTB_R1 + idx_r1) * 45 + idx_tc,
        frz_tab, _GATHER_KBAND * 3 // 4)
    # qcfz/iaus are small enough (37x45, 64x55) for EXACT one-hot MXU
    # lookups (same trick as _lookup2d) instead of paying the
    # ~10-cycles-per-index scattered-gather path twice more; qcfz is
    # additionally banded by its own consumer mask (wfz_tab, consumed in
    # THIS function so the mask is exact).  iaus stays full-height: its
    # ice_on mask spans nearly the whole column (prof/prof_bands.py).
    wfz_band = t_lt_0 & (rc > 0.5 * _RC1)
    cv = _banded_lookup2d_family(tables.qcfz, c.NTB_C, 45, idx["c"],
                                 idx_tc, wfz_band, _GATHER_KBAND, dtype)
    iv = _lookup2d_family(tables.iaus, c.NTB_I, c.NTB_I1, idx["i"],
                          idx["i1"], dtype)

    # gather-consuming rates evaluated HERE so each family gather
    # keeps an XLA consumer fusion (f90:1961-2018, 2065-2148); the
    # fused Pallas kernel then receives the finished rate channels
    ice_on = t_lt_0 & (pro["qi1d"] > c.R1)
    idx_i_top = idx["i"] == c.NTB_I - 1
    # rain<->snow collection via the 5 pre-summed combinations
    # (f90:1961-1997; see the _RACS comment): ma = tmr_racs1+tcr_sacr1,
    # mb = tmr_racs2+tcr_sacr2, mc = tcs_racs1+tms_sacr1, n_cold/n_warm
    ma, mb, mc, n_cold, n_warm = [rv[j] for j in range(5)]
    # cold branch (T < T_0): f90:1966-1985
    prr_rcs_c = jnp.maximum(-rr * odts, -(mb + ma))
    prs_rcs_c = jnp.maximum(-rs * odts, mb - mc)
    prg_rcs_c = jnp.minimum((rr + rs) * odts, ma + mc)
    pnr_rcs_c = n_cold
    # warm branch (T >= T_0): f90:1986-1995
    prs_rcs_w = jnp.maximum(-rs * odts, mb - mc)
    prr_rcs_w = -prs_rcs_w
    pnr_rcs_w = n_warm
    prr_rcs = jnp.where(rs_on, jnp.where(t_lt_0, prr_rcs_c, prr_rcs_w),
                        0.0)
    prs_rcs = jnp.where(rs_on, jnp.where(t_lt_0, prs_rcs_c, prs_rcs_w),
                        0.0)
    prg_rcs = jnp.where(rs_on & t_lt_0, prg_rcs_c, 0.0)
    pnr_rcs = jnp.where(
        rs_on, jnp.minimum(nr * odts,
                           jnp.where(t_lt_0, pnr_rcs_c, pnr_rcs_w)), 0.0)

    # rain<->graupel collection via the 4 pre-summed combinations
    # (f90:1999-2018; see the _RACG comment)
    prg_rcg_c = jnp.minimum(rr * odts, gv[0])
    pnr_rcg_c = jnp.minimum(nr * odts, gv[1])
    prr_rcg_w = jnp.minimum(rg * odts, gv[3])
    pnr_rcg_w = -5.0 * gv[2]                 # explicit break-up f90:2016
    prg_rcg = jnp.where(rg_on, jnp.where(t_lt_0, prg_rcg_c, -prr_rcg_w),
                        0.0)
    prr_rcg = jnp.where(rg_on, jnp.where(t_lt_0, -prg_rcg_c, prr_rcg_w),
                        0.0)
    pnr_rcg = jnp.where(rg_on, jnp.where(t_lt_0, pnr_rcg_c, pnr_rcg_w),
                        0.0)

    # rain freezing, Bigg 1953 via the stacked 4-table family
    # (f90:2065-2076), order _QRFZ
    frz_hom = t_lt_0 & ~(rr > _RR1) & (rr > c.R1) & (temp < c.HGFR)
    prg_rfz = jnp.where(frz_tab, fv[0] * odts, 0.0)
    pri_rfz = jnp.where(frz_tab, fv[1] * odts,
                        jnp.where(frz_hom, rr * odts, 0.0))
    pni_rfz = jnp.where(frz_tab, fv[2] * odts,
                        jnp.where(frz_hom, nr * odts, 0.0))
    pnr_rfz = jnp.where(frz_tab,
                        jnp.minimum(nr * odts, fv[3] * odts),
                        jnp.where(frz_hom, nr * odts, 0.0))


    # cloud water freezing via the stacked pair (f90:2077-2086), _QCFZ
    wfz_tab = t_lt_0 & (rc > _RC1)
    wfz_hom = t_lt_0 & ~(rc > _RC1) & (rc > c.R1) & (temp < c.HGFR)
    pri_wfz = jnp.where(
        wfz_tab, jnp.minimum(rc * odts, cv[0] * odts),
        jnp.where(wfz_hom, rc * odts, 0.0))
    pni_wfz = jnp.where(
        wfz_tab,
        jnp.minimum(jnp.minimum(nt_c * odts, pri_wfz / (2.0 * c.XM0I)),
                    cv[1] * odts),
        jnp.where(wfz_hom, nc * odts, 0.0))

    xdi = pro["xdi"]

    # ice -> snow autoconversion (f90:2135-2148)
    iau_big = idx_i_top | (xdi > 5.0 * c.D0S)
    iau_small = xdi < 0.1 * c.D0S
    prs_iau_t = jnp.minimum(ri * 0.99 * odts, iv[1] * odts)
    pni_iau_t = jnp.minimum(ni * 0.95 * odts, iv[2] * odts)
    prs_iau = jnp.where(ice_on,
                        jnp.where(iau_big, ri * 0.99 * odts,
                                  jnp.where(iau_small, 0.0, prs_iau_t)),
                        0.0)
    pni_iau = jnp.where(ice_on,
                        jnp.where(iau_big, ni * 0.95 * odts,
                                  jnp.where(iau_small, 0.0, pni_iau_t)),
                        0.0)


    return dict(
        tv, ef_sw=ef_sw, tide=iv[0],
        prr_rcs=prr_rcs, prs_rcs=prs_rcs, prg_rcs=prg_rcs,
        pnr_rcs=pnr_rcs, prg_rcg=prg_rcg, prr_rcg=prr_rcg,
        pnr_rcg=pnr_rcg, prg_rfz=prg_rfz, pri_rfz=pri_rfz,
        pni_rfz=pni_rfz, pnr_rfz=pnr_rfz, pri_wfz=pri_wfz,
        pni_wfz=pni_wfz, prs_iau=prs_iau, pni_iau=pni_iau)

def _post_rates(state: ColumnState, pres, w1d, dzq, p8, pro, tables,
                cfg: MicroConfig, dt_f: float, want_rates: bool,
                kernel=False, aero_aux=None):
    """Phases 12-20 of mp_thompson (f90:2574-3686): provisional state at
    t+dt, PSD recompute, saturation adjustment + droplet nucleation, rain
    evaporation, terminal velocities + CFL-substepped sedimentation,
    instant melt/freeze, final apply + PSD renorm.  Gather-free in
    non-aerosol mode, so the fused Pallas kernel runs it VMEM-resident
    (``kernel=True``); aerosol mode additionally gathers tnc_wev /
    tnccn_act (f90:2795-2851) from ``tables`` and stays inline."""
    nz = state.qv.shape[-1]
    dtype = state.qv.dtype
    one = jnp.asarray(1.0, dtype)
    dt = jnp.asarray(float(dt_f), dtype)
    odt = one / dt
    odts = odt          # dtsave == dt (f90:1277-1279)
    nt_c = cfg.nt_c
    ifdry = float(1 - cfg.ifdry)
    z = jnp.zeros_like(state.qv)
    t1d, qv1d = state.t, state.qv
    nwfa1d, nifa1d = state.nwfa, state.nifa
    # phase-2 zeroed state and stale snow moments from the prologue
    qc1d = pro["qc1d"]; nc1d = pro["nc1d"]; qi1d = pro["qi1d"]
    ni1d = pro["ni1d"]; qr1d = pro["qr1d"]; nr1d = pro["nr1d"]
    qs1d = pro["qs1d"]; qg1d = pro["qg1d"]
    smob = pro.get("smob", z)
    smoc = pro.get("smoc", z)
    (tten, qvten, qcten, ncten, qiten, niten, qrten, nrten, qsten, qgten,
     nwfaten, nifaten, vts_boost, mvd_r, prr_gml) = [
        p8[k] for k in P8_OUT]

    # ---- phase 12: provisional state at t+dt (f90:2574-2656) --------------
    temp = t1d + dt * tten
    tempc = temp - 273.15
    qv = jnp.maximum(1.0e-10, qv1d + dt * qvten)
    rho = 0.622 * pres / (c.R_GAS * temp * (qv + 0.622))
    rhof = jnp.sqrt(c.RHO_NOT / rho)
    rhof2 = jnp.sqrt(rhof)
    qvs = rslf(pres, temp)
    ssatw = qv / qvs - 1.0
    ssatw = jnp.where(jnp.abs(ssatw) < c.EPS, 0.0, ssatw)
    diffu = 2.11e-5 * powc(temp / 273.15, 1.94) * (101325.0 / pres)
    visco = jnp.where(tempc >= 0.0,
                      (1.718 + 0.0049 * tempc) * 1.0e-5,
                      (1.718 + 0.0049 * tempc - 1.2e-5 * tempc ** 2) * 1.0e-5)
    vsc2 = jnp.sqrt(rho / visco)
    lvap = c.LVAP0 + (2106.0 - 4218.0) * tempc
    tcond = (5.69 + 0.0168 * tempc) * 1.0e-5 * 418.936
    ocp = 1.0 / (c.CP * (1.0 + 0.887 * qv))
    otemp = 1.0 / temp
    lvt2 = lvap * lvap * ocp * c.ORV * otemp * otemp

    nwfa = jnp.maximum(11.1e6, (nwfa1d + nwfaten * dt) * rho)

    l_qc = (qc1d + qcten * dt) > c.R1
    rc = jnp.where(l_qc, (qc1d + qcten * dt) * rho, c.R1)
    nc = jnp.where(l_qc, jnp.maximum(2.0, (nc1d + ncten * dt) * rho), 2.0)
    if not cfg.is_aerosol_aware:
        nc = jnp.where(l_qc, nt_c, nc)           # f90:2602

    l_qi = (qi1d + qiten * dt) > c.R1
    ri = jnp.where(l_qi, (qi1d + qiten * dt) * rho, c.R1)
    ni = jnp.where(l_qi, jnp.maximum(c.R2, (ni1d + niten * dt) * rho), c.R2)

    l_qr = (qr1d + qrten * dt) > c.R1
    rr = jnp.where(l_qr, (qr1d + qrten * dt) * rho, c.R1)
    nr0 = jnp.maximum(c.R2, (nr1d + nrten * dt) * rho)
    lamr = powc(c.AM_R * CRG[3] * c.ORG2 * nr0 / rr, c.OBMR)
    mvd0 = (3.0 + c.MU_R + 0.672) / lamr
    nr2 = jnp.where(mvd0 > 2.5e-3, _nr_from_mvd(rr, 2.5e-3),
                    jnp.where(mvd0 < c.D0R * 0.75,
                              _nr_from_mvd(rr, c.D0R * 0.75), nr0))
    nr = jnp.where(l_qr, nr2, c.R2)
    mvd_r = jnp.where(l_qr, jnp.clip(mvd0, c.D0R * 0.75, 2.5e-3), mvd_r)

    l_qs = (qs1d + qsten * dt) > c.R1
    rs = jnp.where(l_qs, (qs1d + qsten * dt) * rho, c.R1)
    l_qg = (qg1d + qgten * dt) > c.R1
    rg = jnp.where(l_qg, (qg1d + qgten * dt) * rho, c.R1)

    # ---- phase 13: recompute snow moments / graupel / rain PSD ------------
    # (f90:2662-2750).  Levels no longer snowy keep their stale moments,
    # exactly like the Fortran CYCLE.
    if not cfg.iiwarm:
        sm2 = _snow_moments(rs, temp, l_qs, [("c", CSE[1]), ("d", CSE[14])])
        smob = jnp.where(l_qs, sm2["b"], smob)
        smoc = jnp.where(l_qs, sm2["c"], smoc)
        ilamg, n0_g = _graupel_psd(rg, temp, l_qr, mvd_r, nz, kernel)
    ilamr, mvd_r, n0_r = _rain_psd(rr, nr)

    # ---- phase 14: saturation adjustment + droplet nucleation -------------
    # (f90:2780-2874).  Newton 3-iteration solve for the condensation amount.
    orho = 1.0 / rho                                # f90:2781
    sat_mask = (ssatw > c.EPS) | ((ssatw < -c.EPS) & l_qc)
    clap = (qv - qvs) / (1.0 + lvt2 * qvs)
    for _ in range(3):
        ex = jnp.exp(jnp.clip(lvt2 * clap, -50.0, 50.0))
        fcd = qvs * ex - qv + clap
        dfcd = qvs * lvt2 * ex + 1.0
        clap = clap - fcd / dfcd
    xrc = rc + clap * rho
    prw_vcd_pos = clap * odt
    if cfg.is_aerosol_aware:
        # explicit CCN activation from the parcel-model table
        # (f90:2795-2801); in the split-kernel TPU path the lookup ran in
        # the XLA stage (aerosol_lookup_stage) and arrives as an operand
        if aero_aux is not None:
            xnc_act = aero_aux["xnc_act"]
        else:
            xnc_act = jnp.maximum(2.0, activ_ncloud(
                temp, w1d, nwfa, tables.tnccn_corners))
    else:
        xnc_act = nt_c      # activ_ncloud degenerates to NCCN*1.0
    pnc_wcd_pos = jnp.where(clap > c.EPS,
                            0.5 * (xnc_act - nc + jnp.abs(xnc_act - nc))
                            * odts * orho, 0.0)
    if cfg.is_aerosol_aware:
        # evaporate the explicit number of drops smaller than Dc_star
        # via the tnc_wev lookup (f90:2804-2851)
        evap_br = (clap < -c.EPS) & (ssatw < -1.0e-6)
        if aero_aux is not None:
            wev = aero_aux["wev"]      # looked up in the XLA stage
        else:
            t1_evd, rvs_wd = _subl_prefactor(temp, qvs, rho, diffu,
                                             tcond, ssatw, lvap,
                                             2.0 * c.PI)
            dc_star = jnp.sqrt(jnp.maximum(
                0.0, -2.0 * dt * t1_evd / (2.0 * c.PI) * 4.0 * diffu
                * ssatw * rvs_wd / c.RHO_W))
            idx_d = jnp.clip((1.0e6 * dc_star).astype(jnp.int32), 1,
                             c.NBC) - 1
            idx_n = tnc_index(nc, float(c.T_NC[0]), c.NIC1, c.NBC)
            idx_ce = jnp.where(rc > _RC1,
                               decade_index(rc, c.NIC2, c.NTB_C), 0)
            # wev survives only under evap_br AND sat_mask's negative
            # branch (ssatw < -EPS & l_qc, f90:2783) — band by both, or
            # the band spans every subsaturated level and degenerates
            # to the full 1M-index gather (measured 7 ms/step)
            if not kernel and temp.ndim == 2:
                lin_wev = (idx_d * c.NTB_C + idx_ce) * c.NBC + idx_n
                (wev,) = _banded_gather(tables.tnc_wev.reshape(-1, 1),
                                        lin_wev, evap_br & l_qc,
                                        _GATHER_KBAND)
            else:
                wev = tables.tnc_wev[idx_d, idx_ce, idx_n]
        pnc_wcd_pos = jnp.where(
            evap_br,
            jnp.maximum(-nc * 0.99 * orho * odt, -wev * orho * odt),
            pnc_wcd_pos)
        prw_vcd_pos = jnp.where(
            evap_br,
            jnp.maximum(-rc * 0.99 * orho * odt, prw_vcd_pos),
            prw_vcd_pos)
    # full-evaporation branch (xrc <= R1, f90:2853-2856)
    prw_vcd = jnp.where(xrc > c.R1, prw_vcd_pos, -rc * orho * odt)
    pnc_wcd = jnp.where(xrc > c.R1, pnc_wcd_pos, -nc * orho * odt)
    prw_vcd = jnp.where(sat_mask, prw_vcd, 0.0)
    pnc_wcd = jnp.where(sat_mask, pnc_wcd, 0.0)

    qvten = qvten - prw_vcd
    qcten = qcten + prw_vcd
    ncten = ncten + pnc_wcd
    nwfaten = nwfaten - pnc_wcd
    tten = tten + lvap * ocp * prw_vcd * ifdry
    # state refresh inside the mask only (f90:2865-2872)
    rc_n = jnp.maximum(c.R1, (qc1d + dt * qcten) * rho)
    nc_n = jnp.maximum(2.0, (nc1d + dt * ncten) * rho)
    if not cfg.is_aerosol_aware:
        nc_n = jnp.full_like(nc_n, nt_c)
    qv_n = jnp.maximum(1.0e-10, qv1d + dt * qvten)
    temp_n = t1d + dt * tten
    rc = jnp.where(sat_mask, rc_n, rc)
    nc = jnp.where(sat_mask, nc_n, nc)
    qv = jnp.where(sat_mask, qv_n, qv)
    temp = jnp.where(sat_mask, temp_n, temp)
    rho = jnp.where(sat_mask,
                    0.622 * pres / (c.R_GAS * temp * (qv + 0.622)), rho)
    qvs = jnp.where(sat_mask, rslf(pres, temp), qvs)
    ssatw = jnp.where(sat_mask, qv / qvs - 1.0, ssatw)

    # ---- phase 15: rain evaporation (f90:2880-2960) -----------------------
    rev_mask = (ssatw < -c.EPS) & l_qr & ~(prw_vcd > 0.0)
    tempc = temp - 273.15
    orho = 1.0 / rho
    # thermo locals recomputed inside the masked loop in the reference
    # (f90:2883-2897); persistent ones (lvap, ocp) update under the mask only
    rhof2_c = jnp.sqrt(jnp.sqrt(c.RHO_NOT * orho))
    diffu_c = 2.11e-5 * powc(temp / 273.15, 1.94) * (101325.0 / pres)
    visco_c = jnp.where(
        tempc >= 0.0,
        (1.718 + 0.0049 * tempc) * 1.0e-5,
        (1.718 + 0.0049 * tempc - 1.2e-5 * tempc ** 2) * 1.0e-5)
    vsc2_c = jnp.sqrt(rho / visco_c)
    lvap_c = c.LVAP0 + (2106.0 - 4218.0) * tempc
    tcond_c = (5.69 + 0.0168 * tempc) * 1.0e-5 * 418.936
    ocp_c = 1.0 / (c.CP * (1.0 + 0.887 * qv))
    lvap = jnp.where(rev_mask, lvap_c, lvap)
    ocp = jnp.where(rev_mask, ocp_c, ocp)
    t1_evap, rvs_w = _subl_prefactor(
        temp, qvs, rho, diffu_c, tcond_c, jnp.minimum(-1.0e-9, ssatw),
        lvap_c, 2.0 * c.PI)
    lamr = 1.0 / ilamr
    quick = (qv / qvs < 0.95) & (rr * orho <= 1.0e-8)
    rev0 = (t1_evap * diffu_c * (-ssatw) * n0_r * rvs_w
            * (c.T1_QR_EV * powc(ilamr, CRE[10])
               + c.T2_QR_EV * vsc2_c * rhof2_c
               * powc(lamr + 0.5 * c.FV_R, -CRE[11])))
    rate_max = jnp.minimum(rr * orho * odts, (qvs - qv) * odts)
    rev1 = jnp.minimum(rate_max, rev0 * orho)
    # graupel-melt suppression factor (f90:2940-2943)
    eva_factor = jnp.where(prr_gml > 0.0,
                           jnp.minimum(1.0, 0.01 + 0.98 * (tempc / 20.0)),
                           1.0)
    prv_rev = jnp.where(rev_mask,
                        jnp.where(quick, rr * orho * odts, rev1 * eva_factor),
                        0.0)
    pnr_rev = jnp.where(rev_mask,
                        jnp.minimum(nr * 0.99 * orho * odts,
                                    prv_rev * nr / jnp.maximum(rr, c.R1)),
                        0.0)
    qrten = qrten - prv_rev
    qvten = qvten + prv_rev
    nrten = nrten - pnr_rev
    nwfaten = nwfaten + pnr_rev
    tten = tten - lvap * ocp * prv_rev * ifdry
    rr = jnp.where(rev_mask,
                   jnp.maximum(c.R1, (qr1d + dt * qrten) * rho), rr)
    qv = jnp.where(rev_mask, jnp.maximum(1.0e-10, qv1d + dt * qvten), qv)
    nr = jnp.where(rev_mask,
                   jnp.maximum(c.R2, (nr1d + dt * nrten) * rho), nr)
    temp = jnp.where(rev_mask, t1d + dt * tten, temp)
    rho = jnp.where(rev_mask,
                    0.622 * pres / (c.R_GAS * temp * (qv + 0.622)), rho)

    # ---- phases 17+18: terminal velocities + substepped sedimentation -----
    # (f90:3198-3578)
    kk = _kiota(nz, kernel)
    top = nz - 1
    odzq = 1.0 / dzq
    orho = 1.0 / rho
    rhof = jnp.sqrt(c.RHO_NOT / rho)                # f90:3219

    def _cfl(vt_mask, vt):
        # per-column CFL bookkeeping (f90:3239-3246 pattern): ksed / nstep /
        # onstep are per column; the fori trip count is the batch max, with
        # per-column masking inside the sweep
        ksed = jnp.max(jnp.where(vt_mask, kk, 0), axis=-1, keepdims=True)
        ksed = jnp.where(ksed == top, top - 1, ksed)
        nstep = jnp.max(jnp.where(vt_mask,
                                  (dt * vt * odzq + 1.0).astype(jnp.int32),
                                  0), axis=-1, keepdims=True)
        n_loop = jnp.maximum(nstep, 1)
        return ksed, n_loop, 1.0 / n_loop.astype(dtype)

    def _sweep(n_loop, onstep, ksed, vts_mass, vts_num, ten_m, ten_n,
               dens_m, dens_n, floor_m, floor_n, gate_sed):
        """One species' substepped upwind sweep (f90:3365-3399 pattern).
        ``vts_num`` / number args may be None for single-moment species.
        Rank-polymorphic: runs max-over-batch substeps with per-column
        (n < n_loop) masking, reproducing each column's own nstep/onstep.
        (Inside the fused kernel the batch is one column BLOCK, so quiet
        blocks do not pay a stormy block's trip count.)  The surface-precip
        accumulator keeps a trailing singleton axis so every loop-carried
        value stays >= 2-D — Mosaic cannot vreg-cast the 1-D masks the
        squeezed form produces."""
        def shift_up(a):
            return jnp.concatenate([a[..., 1:], a[..., -1:] * 0.0], axis=-1)

        n_iter = jnp.max(n_loop)

        def body(n, carry):
            ten_m, ten_n, dm, dn, ppt = carry
            active = n < n_loop                       # (..., 1)
            upd = ((kk == top) | (kk <= ksed)) & active
            sed_m = vts_mass * dm * gate_sed
            dflx_m = shift_up(sed_m) - sed_m
            ten_m = jnp.where(upd, ten_m + dflx_m * odzq * onstep * orho,
                              ten_m)
            dm = jnp.where(upd,
                           jnp.maximum(floor_m, dm + dflx_m * odzq * dt
                                       * onstep), dm)
            if vts_num is not None:
                sed_n = vts_num * dn * gate_sed
                dflx_n = shift_up(sed_n) - sed_n
                ten_n = jnp.where(upd, ten_n + dflx_n * odzq * onstep * orho,
                                  ten_n)
                dn = jnp.where(upd,
                               jnp.maximum(floor_n, dn + dflx_n * odzq * dt
                                           * onstep), dn)
            ppt = ppt + jnp.where(
                active[..., 0:1] & (dm[..., 0:1] > c.R1 * 10.0),
                sed_m[..., 0:1] * dt * onstep[..., 0:1], 0.0)
            return ten_m, ten_n, dm, dn, ppt

        init = (ten_m, ten_n if ten_n is not None else ten_m,
                dens_m, dens_n if dens_n is not None else dens_m,
                jnp.zeros(dens_m.shape[:-1] + (1,), dtype))
        ten_m, ten_n, dm, dn, ppt = lax.fori_loop(0, n_iter, body, init)
        return ten_m, ten_n, dm, dn, ppt

    # rain (never gated by l_sediment; f90:3365-3399)
    valid_r = rr > c.R1
    lamr = powc(c.AM_R * CRG[3] * c.ORG2 * nr / rr, c.OBMR)
    vtr_m = (rhof * c.AV_R * CRG[6] * c.ORG3 * powc(lamr, CRE[3])
             * powc(lamr + c.FV_R, -CRE[6]))
    # deliberately slower number-weighted fall to curb size sorting
    # (f90:3229-3233)
    vtr_n = (rhof * c.AV_R * CRG[7] / CRG[12] * powc(lamr, CRE[12])
             * powc(lamr + c.FV_R, -CRE[7]))
    vtrk = _fill_down(vtr_m, valid_r, kernel)
    vtnrk = _fill_down(vtr_n, valid_r, kernel)
    vmax_r = jnp.maximum(vtrk, vtnrk)
    ksed_r, nloop_r, onstep_r = _cfl(vmax_r > 1.0e-3, vmax_r)
    qrten, nrten, rr, nr, pptrain = _sweep(
        nloop_r, onstep_r, ksed_r, vtrk, vtnrk, qrten, nrten, rr, nr,
        c.R1, c.R2, one)

    pptice = jnp.zeros(rr.shape[:-1] + (1,), dtype)
    pptsnow = jnp.zeros(rr.shape[:-1] + (1,), dtype)
    pptgraul = jnp.zeros(rr.shape[:-1] + (1,), dtype)
    if not cfg.iiwarm:
        gate = one if cfg.l_sediment else jnp.zeros((), dtype)

        # cloud ice (f90:3447-3480)
        valid_i = ri > c.R1
        lami = powc(c.AM_I * CIG[2] * c.OIG1 * ni / ri, c.OBMI)
        ilami = 1.0 / lami
        vti_m = rhof * c.AV_I * CIG[3] * c.OIG2 * powc(ilami, c.BV_I)
        vti_n = rhof * c.AV_I * CIG[6] / CIG[7] * powc(ilami, c.BV_I)
        vtik = _fill_down(vti_m, valid_i, kernel)
        vtnik = _fill_down(vti_n, valid_i, kernel)
        ksed_i, nloop_i, onstep_i = _cfl(vtik > 1.0e-3, vtik)
        qiten, niten, ri, ni, pptice = _sweep(
            nloop_i, onstep_i, ksed_i, vtik, vtnik, qiten, niten, ri, ni,
            c.R1, c.R2, gate)

        # snow (f90:3284-3317, 3504-3529)
        valid_s = rs > c.R1
        xds = smoc / jnp.maximum(smob, 1e-30)
        mrat = 1.0 / jnp.maximum(xds, 1e-30)
        ils1 = 1.0 / (mrat * c.LAM0 + c.FV_S)
        ils2 = 1.0 / (mrat * c.LAM1 + c.FV_S)
        t1v = c.KAP0 * CSG[4] * powc(ils1, CSE[4])
        t2v = (c.KAP1 * powc(mrat, c.MU_S) * CSG[10]
               * powc(ils2, CSE[10]))
        ils1 = 1.0 / (mrat * c.LAM0)
        ils2 = 1.0 / (mrat * c.LAM1)
        t3v = c.KAP0 * CSG[1] * powc(ils1, CSE[1])
        t4v = (c.KAP1 * powc(mrat, c.MU_S) * CSG[7]
               * powc(ils2, CSE[7]))
        vts = rhof * c.AV_S * (t1v + t2v) / (t3v + t4v)
        vts_melt = jnp.maximum(vts * vts_boost,
                               vts * ((vtrk - vts * vts_boost)
                                      / (temp - c.T_0)))
        vts_eff = jnp.where(temp > (c.T_0 + 0.1), vts_melt, vts * vts_boost)
        vtsk = _fill_down(vts_eff, valid_s, kernel)
        ksed_s, nloop_s, onstep_s = _cfl(vtsk > 1.0e-3, vtsk)
        qsten, _, rs, _, pptsnow = _sweep(
            nloop_s, onstep_s, ksed_s, vtsk, None, qsten, None, rs, None,
            c.R1, c.R1, gate)

        # graupel (f90:3321-3343, 3553-3578)
        valid_g = rg > c.R1
        vtg = rhof * c.AV_G * CGG[6] * c.OGG3 * powc(ilamg, c.BV_G)
        vtg_eff = jnp.where(temp > c.T_0, jnp.maximum(vtg, vtrk), vtg)
        vtgk = _fill_down(vtg_eff, valid_g, kernel)
        ksed_g, nloop_g, onstep_g = _cfl(vtgk > 1.0e-3, vtgk)
        qgten, _, rg, _, pptgraul = _sweep(
            nloop_g, onstep_g, ksed_g, vtgk, None, qgten, None, rg, None,
            c.R1, c.R1, gate)

    # NOTE: cloud-droplet sedimentation is dead code in the reference
    # (assignments commented at f90:3142-3162, loop at :3414-3425 touches
    # only k=kts with uninitialized velocities) — implemented as OFF
    # (SURVEY.md §2.6 quirk 1).

    # ---- phase 19: instant melt / instant freeze (f90:3584-3606) ----------
    if not cfg.iiwarm:
        xri = jnp.maximum(0.0, qi1d + qiten * dt)
        melt_i = (temp > c.T_0) & (xri > 0.0)
        qcten = qcten + jnp.where(melt_i, xri * odt, 0.0)
        ncten = ncten + jnp.where(melt_i, ni1d * odt, 0.0)
        qiten = qiten - jnp.where(melt_i, xri * odt, 0.0)
        niten = jnp.where(melt_i, -ni1d * odt, niten)
        tten = tten - jnp.where(melt_i, c.LFUS * ocp * xri * odt * ifdry,
                                0.0)

        xrc2 = jnp.maximum(0.0, qc1d + qcten * dt)
        frz_c = (temp < c.HGFR) & (xrc2 > 0.0)
        lfus2 = c.LSUB - lvap
        xnc2 = nc1d + ncten * dt
        qiten = qiten + jnp.where(frz_c, xrc2 * odt, 0.0)
        niten = niten + jnp.where(frz_c, xnc2 * odt, 0.0)
        qcten = qcten - jnp.where(frz_c, xrc2 * odt, 0.0)
        ncten = ncten - jnp.where(frz_c, xnc2 * odt, 0.0)
        tten = tten + jnp.where(frz_c, lfus2 * ocp * xrc2 * odt * ifdry,
                                0.0)

    # ---- phase 20: apply tendencies, final PSD renorm (f90:3623-3686) -----
    t_out = t1d + tten * dt
    qv_out = jnp.maximum(1.0e-10, qv1d + qvten * dt)
    qc_out = qc1d + qcten * dt
    nc_out = jnp.maximum(2.0 / rho, nc1d + ncten * dt)
    nwfa_out = jnp.clip(nwfa1d + nwfaten * dt, 11.1e6 / rho, 9999.0e6 / rho)
    nifa_out = jnp.clip(nifa1d + nifaten * dt, c.NA_IN1 * 0.01,
                        9999.0e6 / rho)

    has_c = qc_out > c.R1
    nu_c = jnp.minimum(15, fnint(1000.0e6 / jnp.maximum(nc_out * rho, 1.0))
                       + 2).astype(jnp.int32)
    ccg1_n, ccg2_n, _u, ocg1_n, ocg2_n, cce2_n = _nuc_rows(nu_c, dtype,
                                                           kernel)
    lamc = powc(c.AM_R * ccg2_n * ocg1_n * nc_out
                     / jnp.maximum(qc_out, c.R1), c.OBMR)
    xdc = (c.BM_R + nu_c.astype(dtype) + 1.0) / lamc
    lamc = jnp.where(xdc < c.D0C, cce2_n / c.D0C,
                     jnp.where(xdc > c.D0R * 2.0, cce2_n / (c.D0R * 2.0),
                               lamc))
    nc_renorm = jnp.minimum(ccg1_n * ocg2_n * qc_out / c.AM_R
                            * powc(lamc, c.BM_R), c.NT_C_MAX / rho)
    qc_out = jnp.where(has_c, qc_out, 0.0)
    nc_out = jnp.where(has_c, nc_renorm, 0.0)

    qi_out = qi1d + qiten * dt
    ni_out = jnp.maximum(c.R2 / rho, ni1d + niten * dt)
    has_i = qi_out > c.R1
    lami = powc(c.AM_I * CIG[2] * c.OIG1 * ni_out
                     / jnp.maximum(qi_out, c.R1), c.OBMI)
    xdi = (c.BM_I + c.MU_I + 1.0) / lami
    lami = jnp.where(xdi < 5.0e-6, CIE[2] / 5.0e-6,
                     jnp.where(xdi > 300.0e-6, CIE[2] / 300.0e-6, lami))
    ni_renorm = jnp.minimum(CIG[1] * c.OIG2 * qi_out / c.AM_I
                            * powc(lami, c.BM_I), 499.0e3 / rho)
    qi_out = jnp.where(has_i, qi_out, 0.0)
    ni_out = jnp.where(has_i, ni_renorm, 0.0)

    qr_out = qr1d + qrten * dt
    nr_out = jnp.maximum(c.R2 / rho, nr1d + nrten * dt)
    has_r = qr_out > c.R1
    lamr = powc(c.AM_R * CRG[3] * c.ORG2 * nr_out
                     / jnp.maximum(qr_out, c.R1), c.OBMR)
    mvd_f = jnp.clip((3.0 + c.MU_R + 0.672) / lamr, c.D0R * 0.75, 2.5e-3)
    lamr = (3.0 + c.MU_R + 0.672) / mvd_f
    nr_renorm = CRG[2] * c.ORG3 * qr_out * powc(lamr, c.BM_R) / c.AM_R
    qr_out = jnp.where(has_r, qr_out, 0.0)
    nr_out = jnp.where(has_r, nr_renorm, 0.0)

    qs_out = qs1d + qsten * dt
    qs_out = jnp.where(qs_out > c.R1, qs_out, 0.0)
    qg_out = qg1d + qgten * dt
    qg_out = jnp.where(qg_out > c.R1, qg_out, 0.0)

    new_state = ColumnState(
        t=t_out, qv=qv_out, qc=qc_out, qi=qi_out, qr=qr_out, qs=qs_out,
        qg=qg_out, ni=ni_out, nr=nr_out, nc=nc_out, nwfa=nwfa_out,
        nifa=nifa_out)
    if kernel:
        # keep the trailing singleton: the pallas wrapper stores (BC, 1)
        # precip blocks directly (Mosaic dislikes 1-D values)
        precip = Precip(rain=pptrain, snow=pptsnow, graupel=pptgraul,
                        ice=pptice)
    else:
        precip = Precip(rain=pptrain[..., 0], snow=pptsnow[..., 0],
                        graupel=pptgraul[..., 0], ice=pptice[..., 0])

    # process-rate diagnostics, the save_dg registry of f90:2963-3124
    # (phase 8-11 rates come from the extracted block; phase-15 rain
    # evaporation rates are computed in this function)
    if want_rates:
        # in the split-kernel path kernel B receives only the P8_OUT
        # tendencies; the P8_RATES channels are merged back by the
        # fused_post wrapper from kernel A's p8
        diag = {k: p8[k] for k in P8_RATES if k in p8}
        diag["prr_gml"] = prr_gml
        diag["prv_rev"] = prv_rev
        diag["pnr_rev"] = pnr_rev
    else:
        diag = {}
    return new_state, precip, diag


def core_from_tables(state: ColumnState, pres, w1d, dzq, tv, cfg, dt_f,
                     want_rates, kernel=False):
    """Phases 2-20 given only the raw state and the table-stage channels
    ``tv`` — the body of the fused Pallas kernel (``kernel=True``) and its
    inline semantics twin for equivalence tests.  Recomputes the prologue
    from the raw state (pure VPU math, free inside the kernel; XLA CSEs
    the duplicate against the table stage on the inline path)."""
    pro, _ = _prologue(state, pres, cfg, kernel=kernel, want_idx=False)
    pro.update(tv)
    p8 = rates_and_tendencies(pro, cfg, dt_f, want_rates)
    return _post_rates(state, pres, w1d, dzq, p8, pro, None, cfg, dt_f,
                       want_rates, kernel=kernel)


def rates_from_tables(state: ColumnState, pres, tv, cfg, dt_f,
                      want_rates, kernel=False):
    """Phases 2-11 given the raw state and table channels — the body of
    the aerosol split-kernel's FIRST kernel (pallas_step.fused_rates).
    Returns the p8 dict (P8_OUT tendencies + P8_RATES when wanted)."""
    pro, _ = _prologue(state, pres, cfg, kernel=kernel, want_idx=False)
    pro.update(tv)
    return rates_and_tendencies(pro, cfg, dt_f, want_rates)


def post_from_p8(state: ColumnState, pres, dzq, p8, cfg, dt_f,
                 want_rates, kernel=False, aero_aux=None):
    """Phases 12-20 given the raw state + p8 tendencies (+ the aerosol
    lookup results) — the body of the split-kernel's SECOND kernel
    (pallas_step.fused_post).  Recomputes the prologue VMEM-resident for
    the stale snow moments / phase-2 zeroed state, exactly like
    core_from_tables."""
    pro, _ = _prologue(state, pres, cfg, kernel=kernel, want_idx=False)
    return _post_rates(state, pres, None, dzq, p8, pro, None, cfg, dt_f,
                       want_rates, kernel=kernel, aero_aux=aero_aux)


def aerosol_lookup_stage(state: ColumnState, pres, w1d, p8,
                         tables: DeviceTables, cfg, dt_f):
    """The two aerosol-mode table lookups of phase 14, evaluated in the
    XLA stage between the split kernels (f90:2795-2851).

    Both lookups need the PROVISIONAL (phase-12) state, which depends on
    the p8 tendencies — that is why the one-kernel design cannot cover
    aerosol mode (the gathers cannot run mid-kernel; VERDICT r4 next
    #2).  This stage re-derives just the phase-12 thermodynamics the
    lookups read (f90:2574-2656 restricted to temp/qv/rho/nc/rc and the
    condensation Newton, f90:2780-2793), then:

      * ``xnc_act``: CCN activation via the one-hot corner fetch
        (aerosol.activ_ncloud);
      * ``wev``: the drop-evaporation number via the tnc_wev gather,
        banded by a slack-widened evaporation-branch mask (the kernel
        re-derives the exact mask in Mosaic arithmetic; 0.5x slack on
        both thresholds keeps the band a superset across ulp
        differences).
    """
    dtype = state.qv.dtype
    dt = jnp.asarray(float(dt_f), dtype)
    odt = 1.0 / dt
    tten = p8["tten"]; qvten = p8["qvten"]; qcten = p8["qcten"]
    ncten = p8["ncten"]; nwfaten = p8["nwfaten"]
    temp = state.t + dt * tten
    tempc = temp - 273.15
    qv = jnp.maximum(1.0e-10, state.qv + dt * qvten)
    rho = 0.622 * pres / (c.R_GAS * temp * (qv + 0.622))
    qvs = rslf(pres, temp)
    ssatw = qv / qvs - 1.0
    ssatw = jnp.where(jnp.abs(ssatw) < c.EPS, 0.0, ssatw)
    diffu = 2.11e-5 * powc(temp / 273.15, 1.94) * (101325.0 / pres)
    lvap = c.LVAP0 + (2106.0 - 4218.0) * tempc
    tcond = (5.69 + 0.0168 * tempc) * 1.0e-5 * 418.936
    ocp = 1.0 / (c.CP * (1.0 + 0.887 * qv))
    otemp = 1.0 / temp
    lvt2 = lvap * lvap * ocp * c.ORV * otemp * otemp
    nwfa = jnp.maximum(11.1e6, (state.nwfa + nwfaten * dt) * rho)
    l_qc = (state.qc + qcten * dt) > c.R1
    rc = jnp.where(l_qc, (state.qc + qcten * dt) * rho, c.R1)
    nc = jnp.where(l_qc,
                   jnp.maximum(2.0, (state.nc + ncten * dt) * rho), 2.0)
    # condensation Newton (f90:2784-2789)
    clap = (qv - qvs) / (1.0 + lvt2 * qvs)
    for _ in range(3):
        ex = jnp.exp(jnp.clip(lvt2 * clap, -50.0, 50.0))
        fcd = qvs * ex - qv + clap
        dfcd = qvs * lvt2 * ex + 1.0
        clap = clap - fcd / dfcd

    xnc_act = jnp.maximum(2.0, activ_ncloud(temp, w1d, nwfa,
                                            tables.tnccn_corners))

    # wev is consumed only where sat_mask's NEGATIVE branch holds, which
    # requires cloud presence (ssatw < -EPS & l_qc, f90:2783) — without
    # the l_qc term the band spans every subsaturated level and the
    # banded gather degenerates to the full 1M-index path (measured
    # 7 ms/step).  All three terms slacked against kernel-side ulps.
    evap_band = ((clap < -0.5 * c.EPS) & (ssatw < -0.5e-6)
                 & ((state.qc + qcten * dt) > 0.5 * c.R1))
    t1_evd, rvs_wd = _subl_prefactor(temp, qvs, rho, diffu, tcond,
                                     ssatw, lvap, 2.0 * c.PI)
    dc_star = jnp.sqrt(jnp.maximum(
        0.0, -2.0 * dt * t1_evd / (2.0 * c.PI) * 4.0 * diffu * ssatw
        * rvs_wd / c.RHO_W))
    idx_d = jnp.clip((1.0e6 * dc_star).astype(jnp.int32), 1, c.NBC) - 1
    idx_n = tnc_index(nc, float(c.T_NC[0]), c.NIC1, c.NBC)
    idx_ce = jnp.where(rc > _RC1, decade_index(rc, c.NIC2, c.NTB_C), 0)
    if state.qv.ndim == 2:
        lin_wev = (idx_d * c.NTB_C + idx_ce) * c.NBC + idx_n
        # 64-level window: 48 measured SLOWER for aerosol1d (occasional
        # band overflow puts full 7 ms gathers in the hot window)
        (wev,) = _banded_gather(tables.tnc_wev.reshape(-1, 1), lin_wev,
                                evap_band, _GATHER_KBAND)
    else:
        wev = tables.tnc_wev[idx_d, idx_ce, idx_n]
    return {"xnc_act": xnc_act, "wev": wev}


@partial(jax.jit, static_argnames=("cfg", "dt", "want_rates"))
def column_microphysics(state: ColumnState, pres, w1d, dzq, dt,
                        tables: DeviceTables, cfg: MicroConfig,
                        want_rates: bool = True):
    """One microphysics timestep on a column or batch of columns.

    Args:
      state: ColumnState of (nz,) or (ncol, nz) arrays (bottom = kts = 0).
      pres:  pressure [Pa], broadcastable to state.
      w1d:   vertical velocity [m/s] (only used by aerosol activation).
      dzq:   layer thickness [m], broadcastable to state.
      dt:    timestep [s].  STATIC: must be a hashable Python float (it is
             a jit static argname here and in batched_microphysics /
             vmapped_microphysics); passing a traced/jnp scalar raises an
             unhashable-argument error.  All drivers pass per-case floats.
      tables: device lookup tables.
      cfg:   static MicroConfig.

    Returns:
      (new ColumnState, Precip, diagnostics dict of process-rate profiles).

    Physics per mp_thompson (module_mp_thompson09n.f90:1156-3688); phase
    numbers in the stage functions refer to SURVEY.md §3.2b.  Structure:
    ``_prologue`` (indices) -> ``_table_stage`` (gathers + consumer rates,
    always plain XLA) -> phases 2-20, either inline XLA or — the TPU
    default — as ONE fused Pallas kernel (pallas_step.fused_step)."""
    dt_f = float(dt)        # static: bench/driver pass per-case floats
    pro, idx = _prologue(state, pres, cfg)
    tv = _table_stage(pro, idx, tables, cfg, dt_f)
    if _use_pallas(state, cfg):
        if cfg.is_aerosol_aware:
            # split-kernel path: the phase-14 aerosol lookups need the
            # phase-12 provisional state (see aerosol_lookup_stage)
            from .pallas_step import fused_post, fused_rates
            p8 = fused_rates(state, pres, tv, cfg, dt_f, want_rates)
            aux = aerosol_lookup_stage(state, pres, w1d, p8, tables,
                                       cfg, dt_f)
            return fused_post(state, pres, dzq, p8, aux, cfg, dt_f,
                              want_rates)
        from .pallas_step import fused_step
        return fused_step(state, pres, dzq, tv, cfg, dt_f, want_rates)
    pro.update(tv)
    p8 = rates_and_tendencies(pro, cfg, dt_f, want_rates)
    return _post_rates(state, pres, w1d, dzq, p8, pro, tables, cfg, dt_f,
                       want_rates)


@partial(jax.jit, static_argnames=("cfg", "dt", "want_rates"))
def batched_microphysics(state: ColumnState, pres, w, dzq, dt,
                         tables: DeviceTables, cfg: MicroConfig,
                         want_rates: bool = True):
    """Batched columns: the TPU-native replacement for the reference's
    serial ``do i=1,nx`` column loop (mphys_thompson09n.f90:54).

    The solver is rank-polymorphic — every vertical structure is an
    ``axis=-1`` parallel op — so the whole (ncol, nz) state advances in one
    flat XLA program with no vmap-induced serial scans.  The per-column CFL
    substep counts are preserved exactly (batch-max trip count with
    per-column masking)."""
    return column_microphysics(state, pres, w, dzq, dt, tables, cfg,
                               want_rates)


@partial(jax.jit, static_argnames=("cfg", "dt"))
def vmapped_microphysics(state: ColumnState, pres, w, dzq, dt,
                         tables: DeviceTables, cfg: MicroConfig):
    """vmap formulation of the same computation; kept as a semantics
    cross-check against the rank-polymorphic fast path (tests)."""
    fn = jax.vmap(
        lambda s, p, w_, dz: column_microphysics(s, p, w_, dz, dt, tables,
                                                 cfg),
        in_axes=(0, 0, 0, 0))
    return fn(state, pres, w, dzq)
