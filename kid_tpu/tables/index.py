"""Lookup-table index functions (device code).

The reference finds the decade of a value with a NINT(log10)±1 search and a
goto (module_mp_thompson09n.f90:1762-1881), then forms
``idx = INT(r/10**n) + 10*(n-n2) - (n-n2)`` — i.e. mantissa digit + 9 per
decade above the axis origin.  Here that is branch-free jnp.
"""
from __future__ import annotations

import jax.numpy as jnp


def fnint(x):
    """Fortran NINT: round half away from zero."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def decade_index(r, n2, ntb):
    """0-based decade/mantissa index into a 1..9-per-decade axis.

    Matches f90:1762-1774 (and its clones): for r in [10^n, 10^(n+1)),
    1-based idx = INT(r/10^n) + 9*(n - n2), clamped to [1, ntb].
    Caller masks the ``r <= axis[0]`` case (reference returns 1 there).

    ``n2``/``ntb`` may be arrays: the solver stacks all 8 index fields
    into one call so the log10/exp chain runs once over the stack (8
    separate calls fragment into many small kernels; measured much
    slower on a v5e).  A table-lookup 10^n formulation was tried and was
    7x SLOWER in context despite being faster standalone — the extra
    tiny gathers fragment XLA fusion catastrophically.
    """
    r = jnp.maximum(r, 1e-38)
    n = jnp.floor(jnp.log10(r)).astype(jnp.int32)
    pow10 = jnp.power(jnp.asarray(10.0, r.dtype), n.astype(r.dtype))
    m = r / pow10
    # repair fp edge cases so 1 <= m < 10 exactly as the Fortran search
    # does; the corrected 10**n is pow10/10 or pow10*10 (exact scalar ops,
    # saving the second pow HLO — a guarded exp/log chain on TPU)
    n = jnp.where(m < 1.0, n - 1, jnp.where(m >= 10.0, n + 1, n))
    pow10 = jnp.where(m < 1.0, pow10 / 10.0,
                      jnp.where(m >= 10.0, pow10 * 10.0, pow10))
    m = r / pow10
    idx = m.astype(jnp.int32) + 9 * (n - n2)
    return jnp.clip(idx, 1, ntb) - 1


def log_bin_index(x, bin0: float, bin_last: float, nbins: int):
    """0-based index into log-spaced bins: f90:1717
    ``idx = MIN(nbr, 1 + INT(nbins*log(x/D(1))/log(D(n)/D(1))))``."""
    import math
    scale = float(nbins) / math.log(bin_last / bin0)
    idx = 1 + (scale * jnp.log(x / bin0)).astype(jnp.int32)
    return jnp.clip(idx, 1, nbins) - 1


def tnc_index(nc, t_nc1: float, nic1: int, nbc: int):
    """0-based cloud-droplet-number index (f90:1777-1778):
    ``idx_n = NINT(1 + nbc*log(nc/t_Nc(1))/nic1)`` with integer nic1."""
    idx = fnint(1.0 + float(nbc) * jnp.log(nc / t_nc1) / float(nic1))
    return jnp.clip(idx.astype(jnp.int32), 1, nbc) - 1
