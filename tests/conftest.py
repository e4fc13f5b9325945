"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding code is exercised
via XLA host-platform device spoofing, per the JAX distributed-testing
recipe.  Must run before jax is imported anywhere.
"""

import os

# The persistent compile cache is a steady-state serving optimization; under
# pytest it adds a cache *write* (zstd compress inside the JAX internals) for
# every freshly compiled program, and a full-suite run on this host has
# segfaulted inside that write path (compilation_cache.put_executable_and_time,
# reproduced twice at round 2, rc=139).  Tests compile hundreds of tiny
# programs that are never reused across runs anyway — disable the cache.
os.environ.setdefault("EPPM_TPU_NO_COMPILE_CACHE", "1")

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's TPU plugin re-registers itself in jax.config at import
# time, overriding JAX_PLATFORMS; force it back to CPU post-import.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
