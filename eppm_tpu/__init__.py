"""EPPM-TPU: a TPU-native dense optical-flow engine.

A from-scratch JAX/Pallas reimplementation of the capabilities of
linchaobao/EPPM — "Fast Edge-Preserving PatchMatch for Large Displacement
Optical Flow" (Bao, Yang, Jin; CVPR 2014) — redesigned for TPU hardware:
the whole pipeline is one jitted pure function, the sequential CUDA
propagation sweeps become Jacobi jump-flood rounds, the hot patch cost is a
VMEM-tiled kernel, and multi-chip scaling uses ``shard_map`` over a device
mesh with ``ppermute`` halo exchange.
"""

from .config import (
    DEFAULT_CONFIG,
    EPPMConfig,
    CostConfig,
    PatchMatchConfig,
    PyramidConfig,
    RefineConfig,
    UNKNOWN_FLOW,
    UNKNOWN_FLOW_THRESH,
    INVALID_LOCATION,
)

__version__ = "0.1.0"
