"""Reference-equivalence: the JAX solver vs the NumPy golden oracle.

The oracle (kid_tpu/validation/oracle.py) is a literal fp64
transliteration of mp_thompson (module_mp_thompson09n.f90:1156-3688);
these tests earn the BASELINE.md accuracy target (allclose rtol 1e-4 on
qv,qc,qr,qi,qs,qg,ni,nr,theta) against it, single-step on diverse
synthetic columns and multi-step on evolving warm/mixed columns.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from kid_tpu.config import MicroConfig
from kid_tpu.micro import ColumnState, batched_microphysics
from kid_tpu.micro.solver import device_tables
from kid_tpu.tables.cache import get_tables
from kid_tpu.validation.oracle import mp_thompson_oracle

NZ = 48
FIELDS = ["t", "qv", "qc", "qr", "qi", "qs", "qg", "ni", "nr"]
ORACLE_KEYS = {"t": "t1d", "qv": "qv1d", "qc": "qc1d", "qr": "qr1d",
               "qi": "qi1d", "qs": "qs1d", "qg": "qg1d", "ni": "ni1d",
               "nr": "nr1d"}


def _profile(nz, seed, warm=False):
    """A synthetic but physically plausible column with mixed species."""
    rng = np.random.default_rng(seed)
    zf = np.linspace(0.0, 1.0, nz)
    t = 292.0 - 62.0 * zf + rng.normal(0.0, 0.4, nz)
    p = 98000.0 * np.exp(-1.25 * zf)
    rho = p / (287.04 * t)
    qvs_rough = 3.8e-3 / p * np.exp(17.27 * (t - 273.15) / (t - 35.9)) \
        * 611.2 / 3.8e-3 * 0.622 / p * p  # rough magnitude only
    qv = np.clip(0.8 * 0.622 * 611.2
                 * np.exp(17.27 * (t - 273.15) / np.maximum(t - 35.9, 1.0))
                 / p, 1e-6, 0.02)
    del qvs_rough, rho

    def blob(lo, hi, mag):
        m = np.zeros(nz)
        sl = (zf >= lo) & (zf <= hi)
        m[sl] = mag * (1.0 + 0.5 * rng.random(sl.sum()))
        return m

    qc = blob(0.1, 0.5, 6e-4)
    qr = blob(0.0, 0.35, 3e-4)
    if warm:
        qi = qs = qg = np.zeros(nz)
    else:
        qi = blob(0.55, 0.95, 6e-5)
        qs = blob(0.4, 0.9, 2.5e-4)
        qg = blob(0.25, 0.7, 1.5e-4)
    ni = np.where(qi > 0, 8e4 * (1 + rng.random(nz)), 0.0)
    nr = np.where(qr > 0, 2e5 * (1 + rng.random(nz)), 0.0)
    rho = 0.622 * p / (287.04 * t * (qv + 0.622))
    nc = 100.0e6 / rho
    nwfa = 11.1e6 / rho
    nifa = np.full(nz, 0.5e6 * 0.01)
    dz = np.full(nz, 200.0)
    w = np.zeros(nz)
    return dict(t=t, p=p, qv=qv, qc=qc, qr=qr, qi=qi, qs=qs, qg=qg,
                ni=ni, nr=nr, nc=nc, nwfa=nwfa, nifa=nifa, dz=dz, w=w)


def _run_jax(prof, dt, cfg, tables_dev):
    st = ColumnState(
        t=jnp.asarray(prof["t"]), qv=jnp.asarray(prof["qv"]),
        qc=jnp.asarray(prof["qc"]), qi=jnp.asarray(prof["qi"]),
        qr=jnp.asarray(prof["qr"]), qs=jnp.asarray(prof["qs"]),
        qg=jnp.asarray(prof["qg"]), ni=jnp.asarray(prof["ni"]),
        nr=jnp.asarray(prof["nr"]), nc=jnp.asarray(prof["nc"]),
        nwfa=jnp.asarray(prof["nwfa"]), nifa=jnp.asarray(prof["nifa"]))
    out, ppt, _ = batched_microphysics(
        st, jnp.asarray(prof["p"]), jnp.asarray(prof["w"]),
        jnp.asarray(prof["dz"]), dt, tables_dev, cfg)
    return out, ppt


def _run_oracle(prof, dt, tables, iiwarm, **kw):
    return mp_thompson_oracle(
        prof["qv"], prof["qc"], prof["qi"], prof["qr"], prof["qs"],
        prof["qg"], prof["ni"], prof["nr"], prof["nc"], prof["nwfa"],
        prof["nifa"], prof["t"], prof["p"], prof["w"], prof["dz"], dt,
        tables, iiwarm=iiwarm, **kw)


def _compare(out, oracle, atol_scale=1.0, rtol=1e-4, context=""):
    for f in FIELDS:
        got = np.asarray(getattr(out, f), np.float64)
        want = np.asarray(oracle[ORACLE_KEYS[f]], np.float64)
        # fields have very different magnitudes; atol per-field from its
        # oracle scale so "both ~zero" cells don't fail on noise
        atol = max(want.max(), 1e-12) * 1e-7 * atol_scale
        np.testing.assert_allclose(
            got, want, rtol=rtol, atol=atol,
            err_msg=f"{context} field {f}")


@pytest.fixture(scope="module")
def tables():
    return get_tables(iiwarm=False)


@pytest.fixture(scope="module")
def tables_dev(tables):
    return device_tables(tables, jnp.float64)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_single_step_mixed(tables, tables_dev, seed):
    cfg = MicroConfig(iiwarm=False, dtype="float64")
    prof = _profile(NZ, seed)
    out, ppt = _run_jax(prof, 10.0, cfg, tables_dev)
    want = _run_oracle(prof, 10.0, tables, iiwarm=False)
    _compare(out, want, context=f"seed={seed}")
    np.testing.assert_allclose(np.asarray(ppt.rain), want["pptrain"],
                               rtol=1e-4, atol=1e-15)
    np.testing.assert_allclose(np.asarray(ppt.snow), want["pptsnow"],
                               rtol=1e-4, atol=1e-15)
    np.testing.assert_allclose(np.asarray(ppt.graupel), want["pptgraul"],
                               rtol=1e-4, atol=1e-15)


@pytest.mark.parametrize("seed", [0, 5])
def test_single_step_warm(seed):
    tables_w = get_tables(iiwarm=True)
    tdev = device_tables(tables_w, jnp.float64)
    cfg = MicroConfig(iiwarm=True, dtype="float64")
    prof = _profile(NZ, seed, warm=True)
    out, ppt = _run_jax(prof, 10.0, cfg, tdev)
    want = _run_oracle(prof, 10.0, tables_w, iiwarm=True)
    _compare(out, want, context=f"warm seed={seed}")


@pytest.mark.parametrize("seed", [3, 11])
def test_single_step_aerosol(tables, tables_dev, seed):
    """Aerosol-aware mode: solver vs oracle, incl. nc/nwfa/nifa."""
    cfg = MicroConfig(iiwarm=False, dtype="float64",
                      is_aerosol_aware=True)
    prof = _profile(NZ, seed)
    rng = np.random.default_rng(seed + 100)
    prof["w"] = np.abs(rng.normal(0.5, 0.5, NZ))
    prof["nwfa"] = np.full(NZ, 500.0e6) / (0.622 * prof["p"] / (
        287.04 * prof["t"] * (prof["qv"] + 0.622)))
    prof["nifa"] = np.full(NZ, 2.0e6)
    # carry a real prognostic nc
    prof["nc"] = np.where(prof["qc"] > 0, 150.0e6, 10.0e6) / 1.1
    out, ppt = _run_jax(prof, 10.0, cfg, tables_dev)
    want = _run_oracle(prof, 10.0, tables, iiwarm=False,
                       is_aerosol_aware=True)
    _compare(out, want, context=f"aerosol seed={seed}")
    for f, key in [("nc", "nc1d"), ("nwfa", "nwfa1d"),
                   ("nifa", "nifa1d")]:
        got = np.asarray(getattr(out, f), np.float64)
        w = np.asarray(want[key], np.float64)
        atol = max(w.max(), 1e-12) * 1e-7
        np.testing.assert_allclose(got, w, rtol=1e-4, atol=atol,
                                   err_msg=f"aerosol field {f}")


def test_aerosol_cold_nucleation(tables, tables_dev):
    """Very cold, ice-supersaturated column exercises DeMott + Koop."""
    nz = 32
    t = np.linspace(236.0, 215.0, nz)
    p = np.linspace(40000.0, 15000.0, nz)
    from kid_tpu.validation.oracle import rsif as _rsif
    qvsi = np.array([_rsif(pp, tt) for pp, tt in zip(p, t)])
    prof = dict(
        t=t, p=p, qv=1.5 * qvsi, qc=np.zeros(nz), qr=np.zeros(nz),
        qi=np.full(nz, 2e-6), qs=np.zeros(nz), qg=np.zeros(nz),
        ni=np.full(nz, 1e3), nr=np.zeros(nz),
        nc=np.full(nz, 5e7), nwfa=np.full(nz, 300e6),
        nifa=np.full(nz, 5e6), dz=np.full(nz, 300.0),
        w=np.full(nz, 0.2))
    cfg = MicroConfig(iiwarm=False, dtype="float64",
                      is_aerosol_aware=True)
    out, _ = _run_jax(prof, 10.0, cfg, tables_dev)
    want = _run_oracle(prof, 10.0, tables, iiwarm=False,
                       is_aerosol_aware=True)
    assert max(want["rates"]["pri_iha"].max(),
               want["rates"]["pri_inu"].max()) > 0.0, \
        "profile failed to trigger aerosol ice nucleation"
    for f in FIELDS:
        got = np.asarray(getattr(out, f), np.float64)
        w = np.asarray(want[ORACLE_KEYS[f]], np.float64)
        atol = max(w.max(), 1e-12) * 1e-7
        np.testing.assert_allclose(got, w, rtol=1e-4, atol=atol,
                                   err_msg=f"cold aerosol field {f}")


def test_multistep_mixed(tables, tables_dev):
    """30 coupled steps: the drift test the accuracy target describes."""
    cfg = MicroConfig(iiwarm=False, dtype="float64")
    prof = _profile(NZ, 7)
    jprof = dict(prof)
    for step in range(30):
        out, _ = _run_jax(jprof, 10.0, cfg, tables_dev)
        want = _run_oracle(prof, 10.0, tables, iiwarm=False)
        # feed both their OWN outputs forward (independent trajectories),
        # comparing each step: catches compounding divergence
        for f in FIELDS:
            jprof[f] = np.asarray(getattr(out, f), np.float64)
            prof[f] = np.asarray(want[ORACLE_KEYS[f]], np.float64)
        # nc/nwfa/nifa are re-fed like the KiD driver does
        _compare(out, want, atol_scale=10.0, rtol=2e-4,
                 context=f"step={step}")
        prof = dict(prof, t=prof["t"], qv=prof["qv"])
        jprof = dict(jprof)
        for aux in ("nc", "nwfa", "nifa", "p", "w", "dz"):
            jprof[aux] = prof[aux]
