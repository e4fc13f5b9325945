"""Shared op helpers (single home for stencil/shift/dispatch primitives
previously duplicated across the ops modules)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "shift2d", "grid", "popcount8", "round_up", "on_tpu", "tpu_params",
]


def tpu_params(vmem_limit_mb: int = 100):
    """Mosaic compiler params shared by the Pallas kernels.

    The default scoped-VMEM budget (16 MiB) is sized for compiler-managed
    double buffering; these kernels manage their own DMA windows and their
    roll/slab temporaries legitimately need more stack (measured: the
    separable smoothing kernel peaks at ~19 MiB of scoped VMEM at 640x480
    level-1 tiles).  Hardware assumption: the budget is sized for
    v4/v5-class cores (128 MiB VMEM); pre-v4 generations (16 MiB) are not
    supported targets for these kernels — the `_auto` dispatchers fall
    back to the XLA paths off-TPU, and the kernels' own window sizing
    assumes the larger VMEM."""
    from jax.experimental.pallas import tpu as pltpu

    # jax >= 0.7 names this CompilerParams; earlier releases used
    # TPUCompilerParams.  pyproject pins jax>=0.7, but stay importable on
    # the older spelling rather than failing every kernel call.
    params_cls = getattr(pltpu, "CompilerParams", None) or getattr(
        pltpu, "TPUCompilerParams"
    )
    return params_cls(vmem_limit_bytes=vmem_limit_mb * 1024 * 1024)


def shift2d(a: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Edge-clamped static shift: out[y, x] = a[clamp(y+dy), clamp(x+dx)]
    (CUDA texture clamp semantics); trailing dims pass through."""
    h, w = a.shape[0], a.shape[1]
    ady, adx = abs(dy), abs(dx)
    pad = ((ady, ady), (adx, adx)) + ((0, 0),) * (a.ndim - 2)
    padded = jnp.pad(a, pad, mode="edge")
    return padded[ady + dy : ady + dy + h, adx + dx : adx + dx + w]


def grid(h: int, w: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(ys, xs) int32 coordinate fields."""
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return ys, xs


def popcount8(x: jnp.ndarray) -> jnp.ndarray:
    """Branch-free popcount for 8-bit values stored in int32 (replaces the
    reference's sequential Kernighan loop, bao_pmflow_kernel.cu:280-282)."""
    x = x - ((x >> 1) & 0x55)
    x = (x & 0x33) + ((x >> 2) & 0x33)
    return (x + (x >> 4)) & 0x0F


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def on_tpu() -> bool:
    """True when the default JAX backend is a TPU (Pallas kernel paths)."""
    try:
        return jax.devices()[0].platform not in ("cpu", "gpu")
    except Exception:
        return False
