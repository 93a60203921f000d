"""kid_tpu — a TPU-native kinematic-driver (KiD) microphysics framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
EnverRamirez/KiD reference (Thompson 2009 two-moment bulk microphysics inside
the Shipway & Hill 2012 Kinematic Driver), built for batched-column execution
on TPU device meshes.
"""
from .config import MicroConfig, MIXED1, WARM1

__version__ = "0.1.0"
__all__ = ["MicroConfig", "MIXED1", "WARM1", "__version__"]
