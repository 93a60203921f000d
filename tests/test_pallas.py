"""Pallas rates-kernel vs inline jnp equivalence.

The TPU fast path runs solver.rates_and_tendencies inside one fused
pallas_call (pallas_step.rates_pallas).  Both paths execute the SAME
function, so any difference can only come from the pallas plumbing
(blocking, padding, channel wiring) — exactly what this test pins down,
in interpreter mode so it runs on the CPU CI.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kid_tpu.config import MicroConfig
from kid_tpu.micro import solver as S
from kid_tpu.micro.pallas_step import rates_pallas
from kid_tpu.micro.state import ColumnState
from kid_tpu.tables.cache import get_tables


def _capture_pro(cfg, ncol=12, nz=48, seed=0):
    """Run the prologue of column_microphysics by monkeypatching the
    dispatch — simplest is to rebuild the pro dict via a tiny driver: call
    column_microphysics once with a probe that records ``pro``."""
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
    w = jnp.zeros((ncol, nz), jnp.float32)
    dzq = jnp.full((ncol, nz), 12000.0 / nz, jnp.float32)
    return state, pres, w, dzq


def _assert_equiv(got, want):
    """The two paths compile identical code separately, so FMA-contraction
    noise can flip a clamp/PSD-regime branch in isolated knife-edge cells.
    Require: bulk agreement at the oracle budget (rtol 1e-4) with at most
    0.5% branch-flip cells, each still within 20% (clamps bound both
    branches)."""
    for k in want:
        a, b = np.asarray(got[k]), np.asarray(want[k])
        scale = np.abs(b) + 1e-30
        rel = np.abs(a - b) / scale
        frac_bad = float((rel > 1e-4).mean())
        assert frac_bad <= 0.005, (k, frac_bad)
        assert float(rel.max()) < 0.2, (k, float(rel.max()))


@pytest.mark.parametrize("cfg", [
    MicroConfig(iiwarm=True),
    MicroConfig(iiwarm=False),
    MicroConfig(iiwarm=False, is_aerosol_aware=True),
], ids=["warm", "mixed", "aerosol"])
def test_pallas_rates_match_inline(cfg, monkeypatch):
    state, pres, w, dzq = _capture_pro(cfg)
    tables = S.device_tables(get_tables(iiwarm=cfg.iiwarm), jnp.float32)

    captured = {}
    orig = S.rates_and_tendencies

    def spy(pro, cfg_, dt_f, want_rates=True):
        captured["pro"] = pro
        captured["dt_f"] = dt_f
        return orig(pro, cfg_, dt_f, want_rates)

    monkeypatch.setattr(S, "rates_and_tendencies", spy)
    # inline path, eagerly so the captured pro holds concrete arrays
    with jax.disable_jit():
        S.column_microphysics(state, pres, w, dzq, 10.0, tables, cfg)
    monkeypatch.undo()
    pro = {k: jax.device_get(v) for k, v in captured["pro"].items()}
    pro = {k: jnp.asarray(v) for k, v in pro.items()}

    want = orig(pro, cfg, 10.0, True)
    got = rates_pallas(pro, cfg, 10.0, True, interpret=True)
    _assert_equiv(got, want)


def test_pallas_padding_path():
    """ncol not divisible by the block size exercises the pad/slice."""
    cfg = MicroConfig(iiwarm=False)
    state, pres, w, dzq = _capture_pro(cfg, ncol=7)
    tables = S.device_tables(get_tables(iiwarm=False), jnp.float32)

    captured = {}
    orig = S.rates_and_tendencies

    def spy(pro, cfg_, dt_f, want_rates=True):
        captured["pro"] = pro
        return orig(pro, cfg_, dt_f, want_rates)

    S.rates_and_tendencies, saved = spy, S.rates_and_tendencies
    try:
        with jax.disable_jit():
            S.column_microphysics(state, pres, w, dzq, 10.0, tables, cfg)
    finally:
        S.rates_and_tendencies = saved
    pro = {k: jnp.asarray(jax.device_get(v))
           for k, v in captured["pro"].items()}
    want = saved(pro, cfg, 10.0, False)
    got = rates_pallas(pro, cfg, 10.0, False, interpret=True)
    _assert_equiv(got, want)
