"""Exhaustive validation of the decade/mantissa table-index function against
a literal transcription of the Fortran search (f90:1762-1881)."""
import numpy as np
import jax.numpy as jnp

from kid_tpu import constants as c
from kid_tpu.tables.index import decade_index, fnint, log_bin_index, tnc_index


def _fortran_idx(r, n2, ntb):
    """Literal NINT(log10)±1 search + goto (f90:1763-1771)."""
    nic = int(np.floor(np.abs(np.log10(r)) + 0.5) * np.sign(np.log10(r)))
    n = nic + 1
    for nn in (nic - 1, nic, nic + 1):
        n = nn
        if 1.0 <= r / 10.0 ** nn < 10.0:
            break
    idx = int(r / 10.0 ** n) + 10 * (n - n2) - (n - n2)
    return max(1, min(idx, ntb))


def test_decade_index_on_axis_values():
    # every axis value and midpoints, all four axes
    for axis, n2, ntb in [(c.R_C_AXIS, c.NIC2, c.NTB_C),
                          (c.R_R_AXIS, c.NIR2, c.NTB_R),
                          (c.R_G_AXIS, c.NIG2, c.NTB_G),
                          (c.R_I_AXIS, c.NII2, c.NTB_I),
                          (c.NT_I_AXIS, c.NII3, c.NTB_I1),
                          (c.N0R_EXP_AXIS, c.NIR3, c.NTB_R1),
                          (c.N0G_EXP_AXIS, c.NIG3, c.NTB_G1)]:
        samples = np.concatenate([axis * 1.0000001, axis * 1.5, axis * 0.999,
                                  axis * 9.99])
        got = np.asarray(decade_index(jnp.asarray(samples), n2, ntb))
        want = np.array([_fortran_idx(float(s), n2, ntb) - 1 for s in samples])
        np.testing.assert_array_equal(got, want)


def test_fnint_matches_fortran_nint():
    xs = jnp.asarray([0.4, 0.5, 0.6, 1.5, 2.5, -0.4, -0.5, -1.5, -2.5, 3.49])
    want = np.array([0, 1, 1, 2, 3, 0, -1, -2, -3, 3])
    np.testing.assert_array_equal(np.asarray(fnint(xs)).astype(int), want)


def test_log_bin_index_range():
    d0, dn = float(c.DR_BINS[0]), float(c.DR_BINS[-1])
    xs = jnp.asarray(np.geomspace(d0, dn, 1000))
    idx = np.asarray(log_bin_index(xs, d0, dn, c.NBR))
    assert idx.min() >= 0 and idx.max() <= c.NBR - 1
    # monotone nondecreasing along increasing diameter
    assert (np.diff(idx) >= 0).all()


def test_tnc_index_fortran_literal():
    t1 = float(c.T_NC[0])
    for nc in [2.0, 1e6, 5e7, 1e8, 3e9, 2.9e9]:
        want = int(np.floor(abs(1.0 + c.NBC * np.log(nc / t1) / c.NIC1) + 0.5)
                   * np.sign(1.0 + c.NBC * np.log(nc / t1) / c.NIC1))
        want = max(1, min(want, c.NBC)) - 1
        got = int(tnc_index(jnp.asarray(nc), t1, c.NIC1, c.NBC))
        assert got == want, (nc, got, want)
