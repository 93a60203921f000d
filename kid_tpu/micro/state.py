"""Column state pytrees for the microphysics solver.

The reference passes 15 parallel (kts:kte) arrays into ``mp_thompson``
(module_mp_thompson09n.f90:1156-1162).  Here they are one NamedTuple pytree;
arrays are (nz,) for the single-column kernel and (ncol, nz) after vmap.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ColumnState(NamedTuple):
    """Prognostic column state (mixing ratios kg/kg, numbers #/kg, T in K)."""

    t: jnp.ndarray      # temperature [K] (the wrapper converts theta <-> T)
    qv: jnp.ndarray     # water vapor
    qc: jnp.ndarray     # cloud water
    qi: jnp.ndarray     # cloud ice
    qr: jnp.ndarray     # rain
    qs: jnp.ndarray     # snow
    qg: jnp.ndarray     # graupel
    ni: jnp.ndarray     # ice number
    nr: jnp.ndarray     # rain number
    nc: jnp.ndarray     # cloud droplet number
    nwfa: jnp.ndarray   # water-friendly aerosol number
    nifa: jnp.ndarray   # ice-friendly aerosol number


class Precip(NamedTuple):
    """Per-call surface precipitation depths [m] (reference pptrain..pptice,
    mphys_thompson09n.f90:30, module_mp_thompson09n.f90:3391-3577)."""

    rain: jnp.ndarray
    snow: jnp.ndarray
    graupel: jnp.ndarray
    ice: jnp.ndarray
