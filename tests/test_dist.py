"""Distributed-execution tests on the 8-device virtual CPU mesh:
the STUBMPI-equivalence requirement of SURVEY.md §4.2 — the same program on
a 1-device and an N-device mesh must agree bitwise for column-parallel work
and exactly for the halo-exchanged 2-D stencil."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kid_tpu.dist.mesh import make_mesh, simulate_sharded
from kid_tpu.driver.cases import CUMULUS2D, MIXED1
from kid_tpu.driver.loop import initial_state, simulate
from kid_tpu.micro.solver import device_tables
from kid_tpu.tables.cache import get_tables

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_sharded_2d_matches_single_device():
    case = dataclasses.replace(CUMULUS2D, nx=32, nz=24)
    tables = device_tables(get_tables(iiwarm=True), jnp.float64)
    st0 = initial_state(case, jnp.float64)
    mesh = make_mesh(8)
    f_ref, s_ref = simulate(st0, tables, case, 15, False)
    f_sh, s_sh = simulate_sharded(st0, tables, case, 15, mesh, False)
    for f in f_ref._fields:
        np.testing.assert_array_equal(np.asarray(getattr(f_ref, f)),
                                      np.asarray(getattr(f_sh, f)),
                                      err_msg=f)
    np.testing.assert_array_equal(np.asarray(s_ref.ppt_rain),
                                  np.asarray(s_sh.ppt_rain))


def test_sharded_mixed_phase_bitwise():
    # mixed-phase 2-D flow over 8 shards: exercises ice physics + halos
    from kid_tpu.driver.cases import OROGRAPHIC2D
    case = dataclasses.replace(OROGRAPHIC2D, nx=16, nz=24)
    tables = device_tables(get_tables(iiwarm=False), jnp.float64)
    st0 = initial_state(case, jnp.float64)
    mesh = make_mesh(8)
    f_ref, _ = simulate(st0, tables, case, 5, False)
    f_sh, _ = simulate_sharded(st0, tables, case, 5, mesh, False)
    for f in f_ref._fields:
        np.testing.assert_array_equal(np.asarray(getattr(f_ref, f)),
                                      np.asarray(getattr(f_sh, f)),
                                      err_msg=f)


def test_graft_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
