"""Banded table ops (round-5 perf lever): the dynamic-slice k-band
gathers/lookups must be BITWISE identical to the full-size ops in every
consumed quantity, including when the active band overflows the static
window (the lax.cond fallback).  See solver._banded_gather."""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kid_tpu.micro.solver as S
from kid_tpu.driver.cases import MIXED1
from kid_tpu.driver.loop import initial_state, simulate
from kid_tpu.micro.solver import device_tables
from kid_tpu.tables.cache import get_tables


def test_banded_gather_unit_band_and_fallback():
    """Direct unit check: masked-band, full-band (cond fallback) and
    empty-mask inputs all reproduce table[lin] wherever mask is True."""
    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.random((1000, 4)), jnp.float32)
    lin = jnp.asarray(rng.integers(0, 1000, (32, 48)), jnp.int32)

    def check(mask):
        got = S._banded_gather(table, lin, jnp.asarray(mask), 16)
        want = np.asarray(table)[np.asarray(lin)]
        for j in range(4):
            g = np.asarray(got[j])
            np.testing.assert_array_equal(g[mask], want[mask][:, j])

    narrow = np.zeros((32, 48), bool)
    narrow[:, 20:28] = True                  # fits the 16-level window
    check(narrow)
    wide = np.zeros((32, 48), bool)
    wide[:, 4:44] = True                     # overflows -> full gather
    check(wide)
    check(np.zeros((32, 48), bool))          # empty mask


@pytest.mark.parametrize("case_name", ["mixed1", "aerosol1d"])
def test_banded_case_bitwise_vs_full(case_name, monkeypatch):
    """150 production-path steps with banding on vs off must be bitwise
    identical (the consumed values never differ; only unmasked garbage
    does)."""
    from kid_tpu.driver.cases import CASES
    case = dataclasses.replace(CASES[case_name], nx=4)
    tables = device_tables(get_tables(iiwarm=False), jnp.float32)
    st = initial_state(case, jnp.float32)

    monkeypatch.setattr(S, "_GATHER_KBAND", 64)
    jax.clear_caches()
    f1, s1 = simulate(st, tables, case, 150)
    f1 = jax.tree.map(np.asarray, f1)
    monkeypatch.setattr(S, "_GATHER_KBAND", 0)
    jax.clear_caches()
    f2, s2 = simulate(st, tables, case, 150)
    for name in f1._fields:
        np.testing.assert_array_equal(getattr(f1, name),
                                      np.asarray(getattr(f2, name)), name)
    np.testing.assert_array_equal(np.asarray(s1.ppt_rain),
                                  np.asarray(s2.ppt_rain))


def test_advected_fields_invariants():
    """The static advected stack (round 5): warm-only cases keep the
    never-created ice species EXACTLY zero (so skipping their advection
    is bitwise-exact), and the stack selection matches the reference
    wrapper's round-trip set (mphys_thompson09n.f90:198-245).  nc/nwfa/
    nifa still EVOLVE through the microphysics sinks in every mode
    (f90:2858-2872) — only their x/z ADVECTION is aerosol-mode-only;
    their evolution is pinned against the oracle twin by the fp64
    validation (worst_extra <= 2.8e-11)."""
    import jax.numpy as jnp
    from kid_tpu.driver.cases import AEROSOL1D, MIXED1, WARM1_RECON
    from kid_tpu.driver.loop import KidState, advected_fields

    assert advected_fields(WARM1_RECON.micro) == (
        "theta", "qv", "qc", "qr", "nr")
    assert len(advected_fields(MIXED1.micro)) == 9
    assert advected_fields(AEROSOL1D.micro) == KidState._fields

    case = dataclasses.replace(WARM1_RECON, nx=2)
    tables = device_tables(get_tables(iiwarm=True), jnp.float32)
    st0 = initial_state(case, jnp.float32)
    f, _ = simulate(st0, tables, case, 400)
    for sp in ("qi", "ni", "qs", "qg"):
        assert np.all(np.asarray(getattr(f, sp)) == 0.0), sp
