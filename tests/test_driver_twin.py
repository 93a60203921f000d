"""Driver-level equivalence: full KiD loop (JAX) vs the oracle twin.

The twin (validation/driver_twin.py) replays the exact adapter contract of
``driver.loop.make_step`` with oracle microphysics, so these tests check
the WHOLE driver pipeline — advection, provisional state, theta/T/Exner
mapping, solver, precip accounting — not just one solver call.  The
aerosol case additionally proves nc/nwfa/nifa survive as prognostics
through the driver (round-2 verdict item: no silent per-step reset).

Full-length (3600-step) runs live in ``validate_cases.py`` (too slow for
the unit suite); these short runs cover the same plumbing.
"""
from __future__ import annotations

import numpy as np
import pytest

from kid_tpu.driver.cases import AEROSOL1D, MIXED1
from kid_tpu.driver.loop import run_case
from kid_tpu.tables.cache import get_tables
from kid_tpu.validation.driver_twin import oracle_simulate

N_STEPS = 10


@pytest.mark.parametrize("case", [MIXED1, AEROSOL1D], ids=lambda c: c.name)
def test_driver_matches_oracle_twin(case):
    tables = get_tables(iiwarm=case.micro.iiwarm)
    final, streams = run_case(case, n_steps=N_STEPS)
    fo, ppt = oracle_simulate(case, N_STEPS, tables)
    for f in final._fields:
        a = np.asarray(getattr(final, f), np.float64)
        b = fo[f]
        scale = np.abs(b).max() + 1e-30
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-5 * scale,
                                   err_msg=f"field {f}")
    np.testing.assert_allclose(np.asarray(streams.ppt_rain)[:, 0],
                               ppt["rain"], rtol=1e-4, atol=1e-18)


def test_aerosol_state_is_prognostic():
    """nwfa must deplete where activation/scavenging act — i.e. the
    driver carries aerosol memory instead of resetting it each step
    (reference tendency plumbing: module_mp_thompson09n.f90:2398-2408)."""
    final, _ = run_case(AEROSOL1D, n_steps=30)
    grid = AEROSOL1D.grid()
    nwfa0 = AEROSOL1D.nwfa_init(grid.z)
    nwfa = np.asarray(final.nwfa)[0]
    # advection + activation must have changed the profile measurably
    assert np.max(np.abs(nwfa - nwfa0) / nwfa0.max()) > 1e-4
    # and the solver floor keeps it physical
    assert np.isfinite(nwfa).all() and (nwfa > 0).all()


def test_chunked_simulate_continues_forcing_clock():
    """simulate(istep0=...) must make chunked runs identical to one long
    run — the forcing modulation m(t) continues instead of replaying the
    pulse from t=0 (a real round-4 bug class: a chunked diagnostic
    replayed the updraft pulse five times and doubled the snow)."""
    import jax.numpy as jnp

    from kid_tpu.driver.loop import initial_state, simulate
    from kid_tpu.micro.solver import device_tables

    case = MIXED1
    tables = device_tables(get_tables(iiwarm=False), jnp.float64)
    st0 = initial_state(case, jnp.float64)
    full, _ = simulate(st0, tables, case, 12)
    st, _ = simulate(st0, tables, case, 5)
    st, _ = simulate(st, tables, case, 7, istep0=5)
    for f in st._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(st, f)), np.asarray(getattr(full, f)),
            err_msg=f)
