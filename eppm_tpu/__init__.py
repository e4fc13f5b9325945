"""EPPM-TPU: a TPU-native dense optical-flow engine.

A from-scratch JAX/Pallas reimplementation of the capabilities of
linchaobao/EPPM — "Fast Edge-Preserving PatchMatch for Large Displacement
Optical Flow" (Bao, Yang, Jin; CVPR 2014) — redesigned for TPU hardware:
the whole pipeline is one jitted pure function, the sequential CUDA
propagation sweeps become Jacobi jump-flood rounds, the hot patch cost is a
VMEM-tiled kernel, and multi-chip scaling uses ``shard_map`` over a device
mesh with ``ppermute`` halo exchange.
"""

import os as _os


def _enable_compile_cache() -> None:
    """Point JAX at a persistent compilation cache unless the user already
    configured one.  The Pallas kernels take tens of seconds to compile;
    the cache makes that a once-ever cost.  Opt out with
    EPPM_TPU_NO_COMPILE_CACHE=1."""
    if _os.environ.get("EPPM_TPU_NO_COMPILE_CACHE"):
        return
    if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    import jax

    if jax.config.jax_compilation_cache_dir:
        return
    path = _os.path.join(
        _os.path.expanduser("~"), ".cache", "eppm_tpu", "jax_cache"
    )
    try:
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, AttributeError):
        pass


_enable_compile_cache()

from .config import (
    DEFAULT_CONFIG,
    EPPMConfig,
    CostConfig,
    MatchConfig,
    PatchMatchConfig,
    PyramidConfig,
    RefineConfig,
    UNKNOWN_FLOW,
    UNKNOWN_FLOW_THRESH,
    INVALID_LOCATION,
)

__version__ = "0.1.0"
