"""Fused-step Pallas kernel vs inline XLA equivalence.

The TPU fast path runs phases 2-20 of the solver inside ONE fused
pallas_call (pallas_step.fused_step) whose body is
``solver.core_from_tables(kernel=True)``.  Both paths execute the same
formulas, so any difference can only come from the pallas plumbing
(blocking, padding, channel wiring) or the kernel-mode substitutions
(select-chain nu_c rows, log-doubling cummin/fill-down, 2-D iota) — all
of which are exact.  Pinned here in interpreter mode so it runs on CPU.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kid_tpu.config import MicroConfig
from kid_tpu.micro import solver as S
from kid_tpu.micro.pallas_step import fused_step
from kid_tpu.micro.state import ColumnState
from kid_tpu.tables.cache import get_tables


def _make_batch(ncol=12, nz=48, seed=0):
    rng = np.random.default_rng(seed)
    zc = (np.arange(nz) + 0.5) * (12000.0 / nz)
    p = 101325.0 * np.exp(-zc / 8500.0)
    t = np.maximum(288.0 - 0.0065 * zc, 210.0)
    qv = 0.012 * np.exp(-zc / 2500.0)
    rho = 0.622 * p / (287.04 * t * (qv + 0.622))

    def b(x, scale=1.0):
        arr = np.broadcast_to(x, (ncol, nz)).copy()
        arr *= (1.0 + 0.2 * rng.random((ncol, 1)))
        return jnp.asarray(np.maximum(arr * scale, 0.0), jnp.float32)

    cloud = np.where((zc > 500) & (zc < 3000), 1.0e-3, 0.0)
    rain = np.where(zc < 2000, 3.0e-4, 0.0)
    ice = np.where(zc > 6000, 5.0e-5, 0.0)
    snow = np.where(zc > 5000, 2.0e-4, 0.0)
    state = ColumnState(
        t=b(t), qv=b(qv), qc=b(cloud), qi=b(ice), qr=b(rain),
        qs=b(snow), qg=b(snow, 0.5),
        ni=b(np.where(ice > 0, 1.0e4, 0.0)),
        nr=b(np.where(rain > 0, 1.0e5, 0.0)),
        nc=b(100.0e6 / rho), nwfa=b(300.0e6 / rho), nifa=b(1.0e6 / rho))
    pres = jnp.broadcast_to(jnp.asarray(p, jnp.float32), (ncol, nz))
    dzq = jnp.full((ncol, nz), 12000.0 / nz, jnp.float32)
    return state, pres, dzq


def _both_paths(state, pres, dzq, cfg, want_rates=True, bc=None):
    """(inline, fused-interpret) results for the same inputs, bypassing
    the jitted dispatch so the pallas path is forced regardless of
    backend."""
    tables = S.device_tables(get_tables(iiwarm=cfg.iiwarm), jnp.float32)
    dt_f = 10.0
    pro, idx = S._prologue(state, pres, cfg)
    tv = S._table_stage(pro, idx, tables, cfg, dt_f)
    pro.update(tv)
    p8 = S.rates_and_tendencies(pro, cfg, dt_f, want_rates)
    inline = S._post_rates(state, pres, None, dzq, p8, pro, tables, cfg,
                           dt_f, want_rates)
    fused = fused_step(state, pres, dzq, tv, cfg, dt_f, want_rates,
                       interpret=True, bc=bc)
    return inline, fused


def _flatten(res, want_rates):
    st, ppt, diag = res
    out = {f: getattr(st, f) for f in st._fields}
    if want_rates:
        out.update(diag)
    return out, ppt


def _assert_equiv(got, want):
    """The two paths compile identical formulas through different
    lowerings, so FMA-contraction noise can flip a knife-edge branch in
    isolated cells — e.g. one ulp of (qc1d + qcten*dt) across the R1
    presence floor leaves qc ~ 1e-11 on one path and exactly 0 on the
    other.  Errors are therefore measured against |b| plus a 1e-3
    field-scale floor (a flipped presence cell is physically nil but
    relative-to-zero is infinite); require bulk rtol 1e-4 with at most
    0.5% worse cells, each still within 20%."""
    parent = {"nc": "qc", "ni": "qi", "nr": "qr"}
    for k in want:
        a, b = np.asarray(got[k]), np.asarray(want[k])
        if k in parent and parent[k] in want:
            # number concentrations are slaved to their mass by the final
            # PSD renorm (f90:3623-3686): where BOTH paths agree the mass
            # is trace (< 1e-9 kg/kg ~ 1000x the R1 presence floor), the
            # numbers carried by a flipped phantom cell are inert
            pa = np.asarray(got[parent[k]])
            pb = np.asarray(want[parent[k]])
            ghost = (np.abs(pa) < 1e-9) & (np.abs(pb) < 1e-9)
            a = np.where(ghost, 0.0, a)
            b = np.where(ghost, 0.0, b)
        scale = np.abs(b) + 1e-3 * np.abs(b).max() + 1e-30
        rel = np.abs(a - b) / scale
        # wiring bugs show as WIDESPREAD order-1 divergence; fp-noise in
        # supersaturation-sensitive rates reaches ~1e-3 in a few cells and
        # knife-edge branch flips are rare and bounded (clamps cap both
        # outcomes).  Allow <=0.5% cells over 1e-3 and <=0.2% isolated
        # regime flips.
        n_noise = int((rel > 1e-3).sum())
        n_flip = int((rel > 0.25).sum())
        assert n_noise <= max(3, 0.005 * rel.size), (k, n_noise)
        assert n_flip <= max(2, 0.002 * rel.size), (k, float(rel.max()))


@pytest.mark.parametrize("cfg", [
    MicroConfig(iiwarm=True),
    MicroConfig(iiwarm=False),
], ids=["warm", "mixed"])
def test_fused_step_matches_inline(cfg):
    state, pres, dzq = _make_batch()
    inline, fused = _both_paths(state, pres, dzq, cfg, want_rates=True)
    want, ppt_w = _flatten(inline, True)
    got, ppt_g = _flatten(fused, True)
    _assert_equiv(got, want)
    for pw, pg in zip(ppt_w, ppt_g):
        np.testing.assert_allclose(np.asarray(pg), np.asarray(pw),
                                   rtol=1e-4, atol=1e-12)


def test_aerosol_split_kernels_match_inline():
    """Aerosol-aware mode runs the SPLIT kernel pair (fused_rates ->
    XLA aerosol_lookup_stage -> fused_post; round-5 VERDICT next #2);
    its one-step result must match the inline path within the same
    knife-edge tolerance model as the one-kernel test."""
    from kid_tpu.micro.pallas_step import fused_post, fused_rates

    cfg = MicroConfig(iiwarm=False, is_aerosol_aware=True)
    state, pres, dzq = _make_batch()
    w1d = jnp.full_like(pres, 0.5)
    tables = S.device_tables(get_tables(iiwarm=False), jnp.float32)
    dt_f = 10.0
    pro, idx = S._prologue(state, pres, cfg)
    tv = S._table_stage(pro, idx, tables, cfg, dt_f)
    pro_i = dict(pro)
    pro_i.update(tv)
    p8_i = S.rates_and_tendencies(pro_i, cfg, dt_f, True)
    inline = S._post_rates(state, pres, w1d, dzq, p8_i, pro_i, tables,
                           cfg, dt_f, True)
    p8 = fused_rates(state, pres, tv, cfg, dt_f, True, interpret=True)
    aux = S.aerosol_lookup_stage(state, pres, w1d, p8, tables, cfg, dt_f)
    fused = fused_post(state, pres, dzq, p8, aux, cfg, dt_f, True,
                       interpret=True)
    want, ppt_w = _flatten(inline, True)
    got, ppt_g = _flatten(fused, True)
    _assert_equiv(got, want)
    for pw, pg in zip(ppt_w, ppt_g):
        np.testing.assert_allclose(np.asarray(pg), np.asarray(pw),
                                   rtol=1e-3, atol=1e-12)


def test_fused_step_padding_and_no_rates():
    """ncol not divisible by the block exercises pad/slice; want_rates=False
    exercises the reduced output set."""
    cfg = MicroConfig(iiwarm=False)
    state, pres, dzq = _make_batch(ncol=7)
    inline, fused = _both_paths(state, pres, dzq, cfg, want_rates=False,
                                bc=4)
    want, ppt_w = _flatten(inline, False)
    got, ppt_g = _flatten(fused, False)
    assert got["qr"].shape == want["qr"].shape
    _assert_equiv(got, want)


def test_kernel_mode_substitutions_exact():
    """The three Mosaic substitutions (log-doubling suffix cummin,
    log-doubling fill-down, select-chain nu_c rows) are exact twins of
    the inline formulations."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((5, 37)), jnp.float32)
    a = S._cummin_rev(x, kernel=False)
    b = S._cummin_rev(x, kernel=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    valid = jnp.asarray(rng.random((5, 37)) > 0.6)
    a = S._fill_down(x, valid, kernel=False)
    b = S._fill_down(x, valid, kernel=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    idx = jnp.asarray(rng.integers(0, 16, (5, 37)), jnp.int32)
    a = S._nuc_rows(idx, jnp.float32, kernel=False)
    b = S._nuc_rows(idx, jnp.float32, kernel=True)
    for va, vb in zip(a, b):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=1e-7)


def test_fused_driver_step_matches_unfused():
    """The fully-fused 1-D DRIVER step (advection + provisional state +
    Exner mapping + solver in ONE kernel, pallas_step.fused_kid_step) must
    match the unfused advect -> batched_microphysics -> update sequence."""
    import dataclasses
    import os

    from kid_tpu.driver import loop as L
    from kid_tpu.driver.cases import MIXED1
    from kid_tpu.tables.cache import get_tables as _gt

    case = dataclasses.replace(MIXED1, nx=8)
    grid = case.grid()
    dtype = jnp.float32
    tables = S.device_tables(_gt(iiwarm=False), dtype)
    st = L.initial_state(case, dtype)
    zc = (np.arange(case.nz) + 0.5) * (case.ztop / case.nz)
    rng = np.random.default_rng(3)

    def seed(profile):
        arr = np.broadcast_to(profile, (case.nx, case.nz)).copy()
        arr *= (1.0 + 0.2 * rng.random((case.nx, 1)))
        return jnp.asarray(arr, dtype)

    st = st._replace(
        qc=seed(np.where((zc > 500) & (zc < 3500), 8e-4, 0.0)),
        qr=seed(np.where(zc < 2500, 3e-4, 0.0)),
        nr=seed(np.where(zc < 2500, 1e5, 0.0)),
        qi=seed(np.where(zc > 6000, 4e-5, 0.0)),
        ni=seed(np.where(zc > 6000, 1e4, 0.0)),
        qs=seed(np.where(zc > 5000, 2e-4, 0.0)),
        qg=seed(np.where((zc > 3000) & (zc < 7000), 1e-4, 0.0)))
    pres2 = jnp.broadcast_to(jnp.asarray(grid.pres, dtype),
                             (case.nx, case.nz))
    w_pat = jnp.asarray(case.rhow_pattern(grid), dtype)

    def build(env):
        os.environ["KID_TPU_PALLAS"] = env
        try:
            return L.make_step(case, tables, dtype, w_pat, None, pres2,
                               None, ())
        finally:
            os.environ.pop("KID_TPU_PALLAS", None)

    unfused = jax.jit(build("0"))
    fused = jax.jit(build("1"))
    istep = jnp.asarray(150)            # mid-pulse: w active
    new0, outs0 = unfused(st, istep)
    new1, outs1 = fused(st, istep)
    want = {f: getattr(new0, f) for f in new0._fields}
    got = {f: getattr(new1, f) for f in new1._fields}
    _assert_equiv(got, want)
    np.testing.assert_allclose(np.asarray(outs1.ppt),
                               np.asarray(outs0.ppt),
                               rtol=1e-4, atol=1e-12)
