"""Tests for the previously-untested aux modules (VERDICT r1 task 7):
diag.moments (effective radii / reflectivity), diag.registry,
driver.wrf_adapter, utils.checkpoint — plus full save_dg diagnostics
parity of the time loop (task 5)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kid_tpu.constants as c
from kid_tpu.config import MicroConfig
from kid_tpu.diag.moments import effective_radii, refl_10cm
from kid_tpu.diag.registry import DiagRegistry, registry_from_run
from kid_tpu.driver.cases import MIXED1
from kid_tpu.driver.loop import (ALL_PROFILE_NAMES, MPHYS_TENDENCY_NAMES,
                                 RATE_NAMES, KidState, initial_state,
                                 resolve_profile_names, simulate)
from kid_tpu.micro.solver import device_tables
from kid_tpu.tables.cache import get_tables


# ---------------------------------------------------------------- moments

def _thermo_cols(nz=8):
    t = np.linspace(258.0, 288.0, nz)
    p = np.linspace(60000.0, 95000.0, nz)
    qv = np.full(nz, 5e-3)
    return (jnp.asarray(t), jnp.asarray(p), jnp.asarray(qv))


def test_effective_radii_windows_and_values():
    t, p, qv = _thermo_cols()
    nz = t.shape[0]
    qc = jnp.full((nz,), 0.5e-3)
    qi = jnp.full((nz,), 0.1e-3)
    qs = jnp.full((nz,), 0.2e-3)
    nc = jnp.zeros((nz,))
    ni = jnp.full((nz,), 10.0e3)
    nt_c = 100.0e6
    re_c, re_i, re_s = effective_radii(t, p, qv, qc, nc, qi, ni / 1.0, qs,
                                       nt_c)
    # clamped to the reference windows (f90 calc_effectRad)
    assert np.all(np.asarray(re_c) >= 2.49e-6 - 1e-12)
    assert np.all(np.asarray(re_c) <= 50.0e-6 + 1e-12)
    assert np.all(np.asarray(re_i) >= 4.99e-6 - 1e-12)
    assert np.all(np.asarray(re_i) <= 125.0e-6 + 1e-12)
    assert np.all(np.asarray(re_s) >= 9.99e-6 - 1e-12)
    assert np.all(np.asarray(re_s) <= 999.0e-6 + 1e-12)

    # hand-computed cloud radius: re = 0.5*(3+nu)/lamc with
    # lamc = (nc*am_r*g_ratio(nu)/rc)**(1/3)  (f90:4872-4885)
    rho = 0.622 * np.asarray(p) / (c.R_GAS * np.asarray(t) * (5e-3 + 0.622))
    rc = 0.5e-3 * rho
    nu = min(15, int(np.floor(1000.0e6 / nt_c + 0.5)) + 2)
    g_ratio = {12: 2730.0}[nu]       # Fortran 1-based g_ratio(12)
    lamc = (nt_c * c.AM_R * g_ratio / rc) ** (1.0 / 3.0)
    expect = np.clip(0.5 * (3.0 + nu) / lamc, 2.51e-6, 50.0e-6)
    np.testing.assert_allclose(np.asarray(re_c), expect, rtol=1e-5)

    # zero condensate collapses to the window floor
    zero = jnp.zeros((t.shape[0],))
    re_c0, re_i0, re_s0 = effective_radii(t, p, qv, zero, zero, zero, zero,
                                          zero, nt_c)
    np.testing.assert_allclose(np.asarray(re_c0), 2.49e-6)
    np.testing.assert_allclose(np.asarray(re_i0), 4.99e-6)
    np.testing.assert_allclose(np.asarray(re_s0), 9.99e-6)


def test_refl10cm_rain_sanity_and_monotonic():
    nz = 4
    t = jnp.full((nz,), 285.0)
    p = jnp.full((nz,), 90000.0)
    qv = jnp.full((nz,), 8e-3)
    zero = jnp.zeros((nz,))
    nr = jnp.full((nz,), 5.0e3)          # /kg
    dbz_lo = refl_10cm(qv, zero, jnp.full((nz,), 0.5e-3), nr, zero, zero,
                       t, p)
    dbz_hi = refl_10cm(qv, zero, jnp.full((nz,), 2.0e-3), nr, zero, zero,
                       t, p)
    # plausible rain reflectivities and monotone in rain mass
    assert np.all(np.asarray(dbz_lo) > 10.0)
    assert np.all(np.asarray(dbz_hi) < 70.0)
    assert np.all(np.asarray(dbz_hi) > np.asarray(dbz_lo))
    # no hydrometeors -> effectively -inf-ish floor from the 1e-22 terms
    dbz_dry = refl_10cm(qv, zero, zero, zero, zero, zero, t, p)
    assert np.all(np.asarray(dbz_dry) < -35.0)


def test_refl10cm_snow_vs_hand_rayleigh():
    # pure snow: ze = (0.176/0.93)*(6/pi)^2*(am_s/900)^2 * M(2*bm_s)
    nz = 3
    t = jnp.full((nz,), 263.0)
    p = jnp.full((nz,), 70000.0)
    qv = jnp.full((nz,), 2e-3)
    zero = jnp.zeros((nz,))
    qs = jnp.full((nz,), 1.0e-3)
    dbz = np.asarray(refl_10cm(qv, zero, zero, zero, qs, zero, t, p))
    rho = 0.622 * 70000.0 / (c.R_GAS * 263.0 * (2e-3 + 0.622))
    smob = 1.0e-3 * rho / c.AM_S
    tc0 = 263.0 - 273.15
    m = float(c.CSE[3])
    sa, sb = np.asarray(c.SA), np.asarray(c.SB)
    loga = (sa[0] + sa[1] * tc0 + sa[2] * m + sa[3] * tc0 * m
            + sa[4] * tc0 ** 2 + sa[5] * m * m + sa[6] * tc0 ** 2 * m
            + sa[7] * tc0 * m * m + sa[8] * tc0 ** 3 + sa[9] * m ** 3)
    b = (sb[0] + sb[1] * tc0 + sb[2] * m + sb[3] * tc0 * m
         + sb[4] * tc0 ** 2 + sb[5] * m * m + sb[6] * tc0 ** 2 * m
         + sb[7] * tc0 * m * m + sb[8] * tc0 ** 3 + sb[9] * m ** 3)
    smoz = 10.0 ** (loga + b * np.log10(smob))
    ze = (0.176 / 0.93) * (6.0 / np.pi) ** 2 * (c.AM_S / 900.0) ** 2 * smoz
    expect = 10.0 * np.log10((ze + 2e-22) * 1e18)
    np.testing.assert_allclose(dbz, expect, rtol=1e-4)


# --------------------------------------------------------------- registry

def test_registry_npz_roundtrip(tmp_path):
    reg = DiagRegistry()
    reg.save(np.arange(5.0), "total_surface_ppt", units="kg/kg m",
             dims="time")
    reg.save(np.ones((5, 3)), "prr_wau", units="/kg/s", dims="time,z")
    path = os.path.join(tmp_path, "diags.npz")
    reg.to_npz(path)
    back = DiagRegistry.from_npz(path)
    assert back.names() == reg.names()
    np.testing.assert_array_equal(back["prr_wau"], reg["prr_wau"])
    assert back._streams["prr_wau"].units == "/kg/s"
    assert back._streams["total_surface_ppt"].dims == "time"


def test_registry_netcdf_roundtrip(tmp_path):
    """The pure-NumPy classic-NetCDF sink must round-trip through an
    independent reader (scipy.io.netcdf_file), with dims/units/attrs —
    KiD's own toolchain reads exactly this format
    (mphys_thompson09n.f90:248-308 feeds KiD's netCDF diagnostics)."""
    from scipy.io import netcdf_file

    reg = DiagRegistry()
    reg.save(np.arange(5.0), "total_surface_ppt", units="kg/kg m",
             dims="time")
    reg.save(np.ones((5, 3), np.float32) * 2.5, "prr_wau",
             units="/kg/s", dims="time,z")
    reg.save(np.arange(12.0).reshape(5 - 1, 3)[:2], "qc_2d",
             units="kg/kg", dims="time,z")       # same names, new length
    reg.save(np.asarray(["mixed1"], dtype="U32"), "case", dims="meta")
    path = os.path.join(tmp_path, "diags.nc")
    reg.to_netcdf(path)

    reg.save(np.arange(5, dtype=np.int64), "istep", dims="time")
    reg.to_netcdf(path)      # int stream -> NC_INT
    with netcdf_file(path, "r", mmap=False) as nc:
        np.testing.assert_array_equal(nc.variables["istep"][:],
                                      np.arange(5))
        assert nc.dimensions["time"] == 5
        assert nc.dimensions["z"] == 3
        v = nc.variables["prr_wau"]
        assert v.units.decode() == "/kg/s"
        assert v.dimensions == ("time", "z")
        np.testing.assert_allclose(v[:], 2.5)
        np.testing.assert_array_equal(
            nc.variables["total_surface_ppt"][:], np.arange(5.0))
        assert nc.variables["qc_2d"].shape == (2, 3)
        assert nc.case.decode() == "mixed1"    # meta string -> global att


# -------------------------------------------- save_dg diagnostics parity

def test_full_savedg_parity_mixed1():
    """Every reference save_dg stream name must appear in a mixed1 run's
    registry: the 36 per-level rates (module_mp_thompson09n.f90:2963-3124),
    the per-species surface precip series (mphys_thompson09n.f90:155-182),
    and the wrapper's mphys-tendency back-outs (:198-245)."""
    import dataclasses
    case = dataclasses.replace(MIXED1, nz=24)
    tables = device_tables(get_tables(iiwarm=False), jnp.float64)
    st0 = initial_state(case, jnp.float64)
    final, streams = simulate(st0, tables, case, 5, profile_diags=True)
    reg = registry_from_run("mixed1", streams, case.nx)
    names = set(reg.names())
    for rate in RATE_NAMES:
        assert rate in names, f"missing rate stream {rate}"
        assert reg[rate].shape == (5, case.nx, case.nz)
    for tend in MPHYS_TENDENCY_NAMES:
        assert tend in names, f"missing mphys tendency stream {tend}"
    for sp in ("rain", "ice", "snow", "graupel"):
        assert f"surface_ppt_for_{sp}" in names
    assert "total_surface_ppt" in names
    # warm processes active in a 5-step mixed1 start may all be ~0, but the
    # arrays must be finite
    for rate in RATE_NAMES:
        assert np.all(np.isfinite(reg[rate]))


def test_resolve_profile_names():
    assert resolve_profile_names(False) == ()
    assert resolve_profile_names(True) == ALL_PROFILE_NAMES
    assert resolve_profile_names(("qc", "prr_wau")) == ("qc", "prr_wau")
    with pytest.raises(ValueError):
        resolve_profile_names(("nope",))


def test_selected_profiles_only():
    import dataclasses
    case = dataclasses.replace(MIXED1, nz=16)
    tables = device_tables(get_tables(iiwarm=False), jnp.float64)
    st0 = initial_state(case, jnp.float64)
    _, streams = simulate(st0, tables, case, 3,
                          profile_diags=("qc", "dqv_mphys"))
    assert set(streams.profiles) == {"qc", "dqv_mphys"}


# ------------------------------------------------------------ wrf adapter

def test_wrf_adapter_accumulators_and_negqv():
    from kid_tpu.driver.wrf_adapter import mp_driver_3d
    cfg = MicroConfig(iiwarm=True)
    tables = device_tables(get_tables(iiwarm=True), jnp.float64)
    ni_, nk, nj = 2, 16, 3
    key = jax.random.PRNGKey(0)
    z = np.linspace(100.0, 3100.0, nk)
    p = np.broadcast_to(101325.0 * np.exp(-z / 8000.0)[None, :, None],
                        (ni_, nk, nj)).copy()
    t = np.broadcast_to((293.0 - 0.0065 * z)[None, :, None],
                        (ni_, nk, nj)).copy()
    pii = (p / 101325.0) ** (287.04 / 1004.0)
    th = t / pii
    qv = np.full((ni_, nk, nj), 8e-3)
    qr = np.zeros((ni_, nk, nj))
    qr[:, 4:10, :] = 1.5e-3               # rain shaft aloft -> surface ppt
    nr = np.where(qr > 0, 1.0e4, 0.0)
    zero = np.zeros((ni_, nk, nj))
    dz = np.full((ni_, nk, nj), z[1] - z[0])
    w = np.zeros((ni_, nk, nj))
    acc0 = jnp.full((ni_, nj), 0.25)
    fields, precip, eff = mp_driver_3d(
        *map(jnp.asarray, (qv, qr * 0, qr, zero, zero, zero, zero, nr,
                           th, pii, p, w, dz)),
        20.0, acc0, jnp.zeros((ni_, nj)), jnp.zeros((ni_, nj)),
        tables, cfg, want_eff_rad=True)
    # accumulator algebra: rainnc = prior + this-step
    np.testing.assert_allclose(np.asarray(precip.rainnc),
                               0.25 + np.asarray(precip.rainncv),
                               rtol=1e-12)
    # warm rain only -> snow ratio 0, snow/graupel accumulators untouched
    np.testing.assert_allclose(np.asarray(precip.sr), 0.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(precip.snownc), 0.0, atol=0)
    # shapes restored to (i,k,j); vapor has no negatives after repair
    assert fields["qv"].shape == (ni_, nk, nj)
    assert np.all(np.asarray(fields["qv"]) >= 0.0)
    assert eff is not None and eff["re_cloud"].shape == (ni_, nk, nj)
    del key


def test_wrf_adapter_negqv_repair_unit():
    # the repair itself: negative vapor -> mean of neighbors, >= 1e-7
    qv = jnp.asarray([[1e-3, -5e-4, 2e-3, -1.0, 3e-3]])
    up = jnp.concatenate([qv[:, 1:], qv[:, -1:]], axis=1)
    dn = jnp.concatenate([qv[:, :1], qv[:, :-1]], axis=1)
    fix = jnp.maximum(1.0e-7, 0.5 * (up + dn))
    out = np.asarray(jnp.where(qv < 0.0, fix, qv))
    assert out[0, 1] == pytest.approx(0.5 * (1e-3 + 2e-3))
    assert out[0, 3] >= 1.0e-7
    assert out[0, 0] == 1e-3 and out[0, 2] == 2e-3


# ------------------------------------------------------------- checkpoint

def test_checkpoint_roundtrip_and_fingerprint(tmp_path):
    from kid_tpu.utils.checkpoint import RunCheckpointer
    st = KidState(*[jnp.full((4, 8), float(i))
                   for i in range(len(KidState._fields))])
    ck = RunCheckpointer(str(tmp_path), "warm1")
    assert ck.latest_step() is None
    ck.save(7, st)
    assert ck.latest_step() == 7
    step, back = ck.restore()
    assert step == 7
    for f in KidState._fields:
        np.testing.assert_array_equal(np.asarray(getattr(back, f)),
                                      np.asarray(getattr(st, f)))
    # fingerprint mismatch must refuse to restore
    import json
    meta_path = os.path.join(str(tmp_path), "warm1", "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["fingerprint"] = "bogus"
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="different microphysical"):
        ck.restore()
