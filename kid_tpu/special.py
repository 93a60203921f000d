"""L0 numeric kernels: saturation mixing ratios and special functions.

Reference: module_mp_thompson09n.f90:4530-4717 (GCF/GSER/GAMMLN/GAMMP/WGAMMA,
RSLF, RSIF).  The gamma family is only used at init (host side), where we use
scipy; the Flatau saturation polynomials are hot-path device code and are
written as branch-free jnp (Horner form).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy import special as _sps

# Flatau et al. 1992 8th-order liquid saturation polynomial
# (module_mp_thompson09n.f90:4661-4669).
_RSLF_C = (0.611583699e03, 0.444606896e02, 0.143177157e01, 0.264224321e-1,
           0.299291081e-3, 0.203154182e-5, 0.702620698e-8, 0.379534310e-11,
           -0.321582393e-13)

# Flatau ice saturation polynomial (f90:4696-4704).
_RSIF_C = (0.609868993e03, 0.499320233e02, 0.184672631e01, 0.402737184e-1,
           0.565392987e-3, 0.521693933e-5, 0.307839583e-7, 0.105785160e-9,
           0.161444444e-12)


def _poly8(x, c):
    # Horner evaluation, matching the Fortran nesting exactly (f90:4674).
    acc = c[8]
    for k in range(7, -1, -1):
        acc = c[k] + x * acc
    return acc


def rslf(p, t):
    """Liquid saturation vapor mixing ratio (f90:4656-4686).

    Includes the ``ESL <= 0.15 p`` guard at f90:4675.
    """
    x = jnp.maximum(-80.0, t - 273.16)
    esl = _poly8(x, _RSLF_C)
    esl = jnp.minimum(esl, p * 0.15)
    return 0.622 * esl / (p - esl)


def rsif(p, t):
    """Ice saturation vapor mixing ratio (f90:4691-4717)."""
    x = jnp.maximum(-80.0, t - 273.16)
    esi = _poly8(x, _RSIF_C)
    esi = jnp.minimum(esi, p * 0.15)
    return 0.622 * esi / (p - esi)


def rslf_np(p, t):
    """NumPy float64 twin of :func:`rslf` for host-side table building/tests."""
    x = np.maximum(-80.0, np.asarray(t, np.float64) - 273.16)
    acc = np.float64(_RSLF_C[8])
    for k in range(7, -1, -1):
        acc = _RSLF_C[k] + x * acc
    esl = np.minimum(acc, np.asarray(p, np.float64) * 0.15)
    return 0.622 * esl / (p - esl)


def rsif_np(p, t):
    """NumPy float64 twin of :func:`rsif`."""
    x = np.maximum(-80.0, np.asarray(t, np.float64) - 273.16)
    acc = np.float64(_RSIF_C[8])
    for k in range(7, -1, -1):
        acc = _RSIF_C[k] + x * acc
    esi = np.minimum(acc, np.asarray(p, np.float64) * 0.15)
    return 0.622 * esi / (p - esi)


def gammp(a, x):
    """Regularized lower incomplete gamma P(a,x) (f90:4623-4641). Host side."""
    return _sps.gammainc(a, x)


def gammln(x):
    """ln Γ(x) (f90:4598-4620). Host side."""
    return _sps.gammaln(x)


def wgamma(y):
    """Γ(y) = exp(GAMMLN) (f90:4644-4651). Host side."""
    return np.exp(_sps.gammaln(y))
