"""Column-solver validation: physics invariants and behavioral checks.

With no Fortran toolchain in the image the oracle strategy (SURVEY.md §4.2)
is: (a) exact invariants the scheme guarantees by construction — per-level
water-mass closure of the process terms, precip closure of the sedimentation
sweep; (b) directional physics checks on hand-built soundings; (c) batching
equivalence (vmap == per-column)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kid_tpu import constants as c
from kid_tpu.config import MicroConfig
from kid_tpu.micro import (ColumnState, batched_microphysics,
                           column_microphysics, device_tables)
from kid_tpu.tables.cache import get_tables

NZ = 60
DZ = 100.0
DT = 10.0

CFG_WARM = MicroConfig(iiwarm=True, dtype="float64")
CFG_MIXED = MicroConfig(iiwarm=False, dtype="float64")
TB_WARM = device_tables(get_tables(iiwarm=True), jnp.float64)
TB_MIXED = device_tables(get_tables(iiwarm=False), jnp.float64)


def sounding(surface_t=289.0, qv0=0.011, cold=False):
    zc = (np.arange(NZ) + 0.5) * DZ
    p = 101325.0 * np.exp(-zc / 8500.0)
    t = (surface_t - (0.045 if cold else 0.0065) * zc)
    t = np.maximum(t, 210.0)
    qv = qv0 * np.exp(-zc / 2500.0)
    return zc, p, t, qv


def mkstate(zc, p, t, qv, qc=None, qr=None, nr=None, qi=None, ni=None,
            qs=None, qg=None):
    rho = 0.622 * p / (287.04 * t * (qv + 0.622))
    z = np.zeros(NZ)

    def arr(x):
        return jnp.asarray(z if x is None else x, jnp.float64)

    return ColumnState(
        t=arr(t), qv=arr(qv), qc=arr(qc), qi=arr(qi), qr=arr(qr),
        qs=arr(qs), qg=arr(qg), ni=arr(ni), nr=arr(nr),
        nc=arr(100e6 / rho), nwfa=arr(11.1e6 / rho),
        nifa=arr(0.5e6 * 0.01 / rho)), rho


def run(state, p, cfg, tb, w=None, dt=DT):
    w = jnp.zeros(NZ) if w is None else jnp.asarray(w)
    return column_microphysics(state, jnp.asarray(p), w,
                               jnp.full(NZ, DZ), dt, tb, cfg)


def total_water(s):
    return (np.asarray(s.qv) + np.asarray(s.qc) + np.asarray(s.qi)
            + np.asarray(s.qr) + np.asarray(s.qs) + np.asarray(s.qg))


@pytest.mark.parametrize("cfg,tb", [(CFG_WARM, TB_WARM),
                                    (CFG_MIXED, TB_MIXED)],
                         ids=["warm", "mixed"])
def test_finite_and_nonnegative(cfg, tb):
    zc, p, t, qv = sounding()
    qc = np.where((zc > 500) & (zc < 2500), 1.2e-3, 0.0)
    qr = np.where(zc < 1500, 3e-4, 0.0)
    nr = np.where(qr > 0, 2e5, 0.0)
    st, rho = mkstate(zc, p, t, qv, qc=qc, qr=qr, nr=nr)
    s, ppt, diag = run(st, p, cfg, tb)
    for name, v in zip(ColumnState._fields, s):
        v = np.asarray(v)
        assert np.isfinite(v).all(), name
    for q in [s.qv, s.qc, s.qi, s.qr, s.qs, s.qg, s.ni, s.nr, s.nc]:
        assert (np.asarray(q) >= 0.0).all()
    for k, v in diag.items():
        assert np.isfinite(np.asarray(v)).all(), k


@pytest.mark.parametrize("cfg,tb", [(CFG_WARM, TB_WARM),
                                    (CFG_MIXED, TB_MIXED)],
                         ids=["warm", "mixed"])
def test_column_water_closure(cfg, tb):
    """Column-integrated water at call-time rho changes only by surface
    precipitation (process terms cancel pairwise by construction;
    f90:2411-2547 tendency assembly)."""
    zc, p, t, qv = sounding()
    qc = np.where((zc > 300) & (zc < 2500), 1.5e-3, 0.0)
    qr = np.full(NZ, 4e-4) * np.exp(-zc / 1500.0)
    nr = np.where(qr > 0, 3e5, 0.0)
    st, rho = mkstate(zc, p, t, qv, qc=qc, qr=qr, nr=nr)
    s, ppt, _ = run(st, p, cfg, tb)
    before = float(np.sum(total_water(st) * rho * DZ))
    after = float(np.sum(total_water(s) * rho * DZ))
    fallout = float(ppt.rain + ppt.snow + ppt.graupel + ppt.ice)
    assert fallout > 0.0       # rain reaches the surface in this setup
    # fp64 closure to ~1e-6 relative: the tendency assembly is exactly
    # antisymmetric (f90:2393-2567); the measured residual (~4e-7 rel at
    # dt=10, scaling ~dt^2) comes from the second-order rho refresh
    # between the saturation-adjustment sub-phases, same as the Fortran
    np.testing.assert_allclose(after - before, -fallout,
                               rtol=0.0, atol=2e-6 * before)


def test_no_micro_is_identity_like():
    """Dry, subsaturated, hydrometeor-free column: state passes through
    (the reference exits early at f90:1540)."""
    zc, p, t, qv = sounding(qv0=0.002)
    st, _ = mkstate(zc, p, t, qv)
    s, ppt, _ = run(st, p, CFG_MIXED, TB_MIXED)
    np.testing.assert_allclose(np.asarray(s.t), t, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s.qv), qv, rtol=1e-12)
    assert float(s.qc.max()) == 0.0 and float(s.qr.max()) == 0.0
    assert float(ppt.rain) == 0.0


def test_supersaturation_condenses_and_warms():
    zc, p, t, qv = sounding()
    from kid_tpu.special import rslf_np
    qvs = rslf_np(p, t)
    qv = np.where((zc > 500) & (zc < 1500), qvs * 1.05, qv * 0.5)
    st, _ = mkstate(zc, p, t, qv)
    s, _, _ = run(st, p, CFG_WARM, TB_WARM)
    lev = (zc > 500) & (zc < 1500)
    assert (np.asarray(s.qc)[lev] > 0.0).all()
    assert (np.asarray(s.t)[lev] > t[lev]).all()     # latent heating
    assert (np.asarray(s.qv)[lev] < qv[lev]).all()


def test_autoconversion_moves_cloud_to_rain():
    zc, p, t, qv = sounding()
    qc = np.where((zc > 500) & (zc < 2000), 2.5e-3, 0.0)   # heavy cloud
    st, _ = mkstate(zc, p, t, qv * 0.9, qc=qc)
    s, _, diag = run(st, p, CFG_WARM, TB_WARM, dt=30.0)
    assert float(np.asarray(diag["prr_wau"]).max()) > 0.0
    assert float(s.qr.max()) > 0.0


def test_rain_sediments_and_precipitates():
    zc, p, t, qv = sounding()
    qr = np.where(zc < 1000, 1e-3, 0.0)
    nr = np.where(qr > 0, 1e5, 0.0)
    st, rho = mkstate(zc, p, t, qv * 0.5, qr=qr, nr=nr)
    s, ppt, _ = run(st, p, CFG_WARM, TB_WARM, dt=30.0)
    assert float(ppt.rain) > 0.0
    # profile shifted down: rain above 1 km stays ~zero, surface bin loses
    assert float(np.asarray(s.qr)[zc > 1200].max()) < 1e-6


def test_cold_rain_freezes_mixed_phase():
    zc, p, t, qv = sounding(surface_t=265.0, qv0=0.003, cold=True)
    qr = np.where((zc > 1000) & (zc < 3000), 5e-4, 0.0)
    nr = np.where(qr > 0, 2e5, 0.0)
    st, _ = mkstate(zc, p, t, qv, qr=qr, nr=nr)
    s, _, diag = run(st, p, CFG_MIXED, TB_MIXED, dt=30.0)
    frozen = float(np.asarray(diag["pri_rfz"]).max()
                   + np.asarray(diag["pni_rfz"]).max())
    assert frozen > 0.0
    assert float((np.asarray(s.qg) + np.asarray(s.qi)).max()) > 0.0


def test_snow_melts_above_freezing():
    zc, p, t, qv = sounding(surface_t=293.0)
    qs = np.where((zc > 200) & (zc < 2000), 5e-4, 0.0)
    st, _ = mkstate(zc, p, t, qv * 0.8, qs=qs)
    s, _, diag = run(st, p, CFG_MIXED, TB_MIXED, dt=30.0)
    assert float(np.asarray(diag["prr_sml"]).max()) > 0.0
    assert float(s.qr.max()) > 0.0


def test_ice_nucleation_when_cold_supersaturated():
    zc, p, t, qv = sounding(surface_t=262.0, cold=True)
    from kid_tpu.special import rsif_np
    qvsi = rsif_np(p, t)
    qv = qvsi * 1.30          # strongly ice-supersaturated
    st, _ = mkstate(zc, p, t, qv)
    s, _, diag = run(st, p, CFG_MIXED, TB_MIXED)
    assert float(np.asarray(diag["pri_inu"]).max()) > 0.0
    assert float(s.qi.max()) > 0.0


def test_batched_matches_percolumn():
    zc, p, t, qv = sounding()
    ncol = 4
    rng = np.random.default_rng(0)
    states = []
    for i in range(ncol):
        qc = np.where((zc > 400 + 100 * i) & (zc < 2200), 1e-3
                      + 2e-4 * i, 0.0)
        qr = np.where(zc < 1200, 2e-4 * (i + 1), 0.0)
        nr = np.where(qr > 0, 1e5, 0.0)
        st, _ = mkstate(zc, p, t + rng.normal(0, 0.5, NZ), qv, qc=qc,
                        qr=qr, nr=nr)
        states.append(st)
    batched = ColumnState(*[jnp.stack([getattr(s, f) for s in states])
                            for f in ColumnState._fields])
    pres_b = jnp.tile(jnp.asarray(p), (ncol, 1))
    w_b = jnp.zeros((ncol, NZ))
    dz_b = jnp.full((ncol, NZ), DZ)
    sb, pptb, _ = batched_microphysics(batched, pres_b, w_b, dz_b, DT,
                                       TB_MIXED, CFG_MIXED)
    for i in range(ncol):
        si, ppti, _ = run(states[i], p, CFG_MIXED, TB_MIXED)
        for f in ColumnState._fields:
            np.testing.assert_allclose(np.asarray(getattr(sb, f))[i],
                                       np.asarray(getattr(si, f)),
                                       rtol=1e-12, atol=1e-20,
                                       err_msg=f"col {i} field {f}")
        np.testing.assert_allclose(float(pptb.rain[i]), float(ppti.rain),
                                   rtol=1e-12, atol=1e-20)


def test_l_sediment_switch_gates_ice_not_rain():
    zc, p, t, qv = sounding(surface_t=265.0, cold=True)
    qs = np.where(zc > 500, 1e-3, 0.0)
    qr = np.where(zc < 800, 5e-4, 0.0)
    nr = np.where(qr > 0, 1e5, 0.0)
    st, _ = mkstate(zc, p, t, qv, qs=qs, qr=qr, nr=nr)
    cfg_nosed = MicroConfig(iiwarm=False, l_sediment=False, dtype="float64")
    s, ppt, _ = run(st, p, cfg_nosed, TB_MIXED, dt=30.0)
    assert float(ppt.snow) == 0.0          # gated (f90:3506)
    assert float(ppt.rain) > 0.0           # rain never gated (f90:3365)


def test_lookup2d_family_bitwise_vs_gather():
    """The one-hot MXU family lookup must reproduce the scattered gather
    BITWISE (one-hot rows select exact table values)."""
    import numpy as np
    from kid_tpu.micro.solver import _lookup2d_family

    rng = np.random.default_rng(3)
    n0, n1, k = 37, 45, 2
    fam = jnp.asarray(rng.standard_normal((k, n0 * n1)), jnp.float32)
    i0 = jnp.asarray(rng.integers(0, n0, size=(6, 11)), jnp.int32)
    i1 = jnp.asarray(rng.integers(0, n1, size=(6, 11)), jnp.int32)
    want = fam[:, i0 * n1 + i1]
    got = _lookup2d_family(fam, n0, n1, i0, i1, jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_deep_graupel_substeps_per_column():
    """Deep-convection regime (BASELINE config 3 stress): a column whose
    graupel fall speed forces nstep > 10 CFL substeps
    (module_mp_thompson09n.f90:3239-3343) next to a quiet column.  The
    batch-max trip count with per-column masking must reproduce each
    column's own nstep exactly: batched == per-column, and the stormy
    column matches the literal oracle's substepped sweep."""
    from kid_tpu.micro import solver as S
    from kid_tpu.validation.oracle import mp_thompson_oracle

    dt, dz = 90.0, 60.0
    zc, p, t, qv = sounding(cold=True)
    qg = np.where(zc > 800.0, 0.015, 0.0)        # heavy hail shaft
    qr = np.where(zc < 1500.0, 1e-3, 0.0)
    nr = np.where(qr > 0, 2e5, 0.0)
    stormy, _ = mkstate(zc, p, t, qv, qg=qg, qr=qr, nr=nr)
    quiet, _ = mkstate(zc, p, t, qv)

    # the configuration really is in the nstep > 10 regime: recompute the
    # solver's own graupel fall speed from the prologue products
    pro, _ = S._prologue(stormy, jnp.asarray(p), CFG_MIXED, want_idx=False)
    rhof = np.asarray(pro["rhof"])
    vtg = rhof * c.AV_G * float(c.CGG[6]) * c.OGG3 * np.asarray(
        pro["ilamg"]) ** c.BV_G
    vtg = np.where(np.asarray(pro["rg"]) > c.R1, vtg, 0.0)
    nstep = int((dt * vtg / dz).max()) + 1
    assert nstep > 10, nstep

    batched = ColumnState(*[jnp.stack([getattr(stormy, f),
                                       getattr(quiet, f)])
                            for f in ColumnState._fields])
    sb, pptb, _ = batched_microphysics(
        batched, jnp.tile(jnp.asarray(p), (2, 1)), jnp.zeros((2, NZ)),
        jnp.full((2, NZ), dz), dt, TB_MIXED, CFG_MIXED)
    for i, st in enumerate((stormy, quiet)):
        si, ppti, _ = column_microphysics(
            st, jnp.asarray(p), jnp.zeros(NZ), jnp.full(NZ, dz), dt,
            TB_MIXED, CFG_MIXED)
        for f in ColumnState._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(sb, f))[i], np.asarray(getattr(si, f)),
                rtol=1e-12, atol=1e-20, err_msg=f"col {i} field {f}")
        np.testing.assert_allclose(float(pptb.graupel[i]),
                                   float(ppti.graupel), rtol=1e-12,
                                   atol=1e-20)

    # stormy column vs the literal transliteration (per-species nstep,
    # f90:3336-3343) — proves the masked batch-max sweep reproduces the
    # reference's own substep count, not just self-consistency
    tb_host = get_tables(iiwarm=False)
    o = mp_thompson_oracle(
        *[np.asarray(getattr(stormy, f), np.float64) for f in
          ("qv", "qc", "qi", "qr", "qs", "qg", "ni", "nr", "nc",
           "nwfa", "nifa")],
        np.asarray(stormy.t, np.float64), np.asarray(p, np.float64),
        np.zeros(NZ), np.full(NZ, dz), dt, tb_host,
        iiwarm=False, l_sediment=True, set_nc=100.0,
        is_aerosol_aware=False, ifdry=0, dusty_ice=True, homog_ice=True)
    si, ppti, _ = column_microphysics(
        stormy, jnp.asarray(p), jnp.zeros(NZ), jnp.full(NZ, dz), dt,
        TB_MIXED, CFG_MIXED)
    for f, k in (("qg", "qg1d"), ("qr", "qr1d"), ("qv", "qv1d"),
                 ("t", "t1d")):
        a = np.asarray(getattr(si, f))
        b = np.asarray(o[k])
        scale = np.abs(b).max() + 1e-30
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-9 * scale,
                                   err_msg=f)
    np.testing.assert_allclose(float(ppti.graupel), o["pptgraul"],
                               rtol=1e-9)
