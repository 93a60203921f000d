"""Typed, hashable configuration for the TPU-native Thompson09/KiD framework.

The reference scatters configuration over three layers (KiD namelists,
compile-time flags, and module-level logical constants; see
/root/reference/module_mp_thompson09n.f90:22,28-33 and
/root/reference/mphys_thompson09n.f90:11-17).  Here it is a single frozen
dataclass that is hashable, so it can be a `static_argnum` of jitted
functions and a cache key for the lookup-table store.
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class MicroConfig:
    """Microphysics configuration.

    Mirrors (reference file:line):
      - ``iiwarm``      KiD namelist warm-only switch
                        (module_mp_thompson09n.f90:22, gates :773,1545,...).
      - ``set_nc``      prescribed droplet number in per-cc; ``Nt_c=set_nc*1e6``
                        (module_mp_thompson09n.f90:381).
      - ``l_sediment``  gates ice/snow/graupel sedimentation but NOT rain
                        (module_mp_thompson09n.f90:3449,3506,3555).
      - ``is_aerosol_aware`` / ``dusty_ice`` / ``homog_ice`` / ``ifdry``
                        module-level logicals (module_mp_thompson09n.f90:28-33).
    """

    iiwarm: bool = False
    set_nc: float = 100.0            # per cc; Nt_c = set_nc * 1e6 m^-3
    l_sediment: bool = True
    is_aerosol_aware: bool = False
    dusty_ice: bool = True
    homog_ice: bool = True
    ifdry: int = 0
    # Numerics: compute dtype for the device solver ("float32" or "float64").
    # The Fortran reference uses fp32 state with fp64 process rates
    # (module_mp_thompson09n.f90:1181-1213).  On TPU we default to fp32
    # everywhere; CPU validation tests enable x64.
    dtype: str = "float32"
    # Static upper bound on sedimentation substeps per call (the reference
    # computes nstep dynamically from max CFL, :3239-3246).  Used only by the
    # fixed-trip-count fast path; the default dynamic path uses a traced
    # while-loop and this bound is irrelevant.
    max_sed_substeps: int = 64

    @property
    def nt_c(self) -> float:
        return self.set_nc * 1.0e6


WARM1 = MicroConfig(iiwarm=True)
MIXED1 = MicroConfig(iiwarm=False)
