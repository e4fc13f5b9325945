"""Pallas TPU kernel for global descriptor matching (streaming argmax).

``ops.match.global_match`` scores every frame-1 pixel against every
frame-2 pixel: argmax_b (a.b - |b|^2/2).  The XLA form materializes each
(N1, block) score panel in HBM — N^2 * 4 bytes of traffic (67 GB at a
480x270 coarse level) against ~10 TFLOP of bf16 matmul that the MXU
could finish in ~50 ms.  This kernel streams the score panels: the
running (max, argmax) lives in a VMEM scratch across the whole grid
(flash-attention structure), so HBM traffic collapses to the descriptor
reads.

Scores are quantized (round(s * 4096)) exactly like the XLA oracle so
near-ties resolve identically across compilations.

Dispatch note: the pipeline's proposal grid subsamples by 2 above
MatchConfig.global_stride_threshold, which caps N below the measured
XLA/kernel crossover (~130k targets: XLA ~106 ms, this kernel ~130 ms —
per-grid-step overhead dominates until N is several times larger), so
match_coarse keeps the XLA form.  The kernel is validated against it in
tools/tpu_check.py and is the drop-in for workloads that need
full-resolution global argmax at very large N.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._util import round_up as _round_up, tpu_params as _tpu_params

__all__ = ["global_argmax_pallas"]


def _match_kernel(
    d1_ref, d2_ref,           # HBM: (N1p, D), (N2p, D) bf16
    out_ref,                  # (8, N1p) f32 (row 0: score, row 1: idx)
    a_ref, b_ref, run_ref, sem,
    *,
    BN1: int, BN2: int, D: int, n2: int,
):
    # grid = (n_j, n_i): the LAST grid dim iterates fastest, so the
    # frame-1 block i sweeps inner and the frame-2 panel b is loaded once
    # per outer step j
    j = pl.program_id(0)
    i = pl.program_id(1)
    n_j = pl.num_programs(0)
    n_i = pl.num_programs(1)

    cp_a = pltpu.make_async_copy(
        d1_ref.at[pl.ds(i * BN1, BN1)], a_ref, sem.at[0]
    )
    cp_a.start()

    @pl.when(i == 0)
    def _():
        cp_b = pltpu.make_async_copy(
            d2_ref.at[pl.ds(j * BN2, BN2)], b_ref, sem.at[1]
        )
        cp_b.start()
        cp_b.wait()

    cp_a.wait()

    a = a_ref[:]
    b = b_ref[:]
    scores = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    hn = 0.5 * jnp.sum(
        b.astype(jnp.float32) * b.astype(jnp.float32), axis=1
    )
    scores = scores - hn[None, :]
    # mask frame-2 padding rows
    col = jax.lax.broadcasted_iota(jnp.int32, (BN1, BN2), 1) + j * BN2
    scores = jnp.where(col < n2, jnp.round(scores * 4096.0), -jnp.inf)

    m = jnp.max(scores, axis=1)
    # deterministic first-max index
    hit = scores == m[:, None]
    idx = jnp.min(jnp.where(hit, col, jnp.int32(2**30)), axis=1)

    @pl.when(j == 0)
    def _():
        run_ref[0, pl.ds(i * BN1, BN1)] = jnp.full(
            (BN1,), -jnp.inf, jnp.float32
        )
        run_ref[1, pl.ds(i * BN1, BN1)] = jnp.zeros((BN1,), jnp.float32)

    cur_s = run_ref[0, pl.ds(i * BN1, BN1)]
    cur_i = run_ref[1, pl.ds(i * BN1, BN1)]
    better = m > cur_s
    run_ref[0, pl.ds(i * BN1, BN1)] = jnp.where(better, m, cur_s)
    run_ref[1, pl.ds(i * BN1, BN1)] = jnp.where(
        better, idx.astype(jnp.float32), cur_i
    )

    @pl.when((j == n_j - 1) & (i == n_i - 1))
    def _():
        out_ref[0] = run_ref[0]
        out_ref[1] = run_ref[1]
        for k in range(2, 8):
            out_ref[k] = jnp.zeros_like(run_ref[0])


def global_argmax_pallas(
    desc1: jnp.ndarray, desc2: jnp.ndarray,
    bn1: int = 512, bn2: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(ty, tx) int32 absolute target fields; streaming MXU argmax.

    Semantics match ops.match.global_match (same score, same
    quantization, first-max-wins ties).
    """
    h, w = desc1.shape[0], desc1.shape[1]
    h2, w2 = desc2.shape[0], desc2.shape[1]
    d = desc1.shape[2]
    n1, n2 = h * w, h2 * w2
    Dp = _round_up(d, 128)
    n1p = _round_up(n1, bn1)
    n2p = _round_up(n2, bn2)
    d1 = jnp.pad(
        desc1.reshape(n1, d).astype(jnp.bfloat16),
        ((0, n1p - n1), (0, Dp - d)),
    )
    d2 = jnp.pad(
        desc2.reshape(n2, d).astype(jnp.bfloat16),
        ((0, n2p - n2), (0, Dp - d)),
    )

    kern = functools.partial(
        _match_kernel, BN1=bn1, BN2=bn2, D=Dp, n2=n2
    )
    out = pl.pallas_call(
        kern,
        grid=(n2p // bn2, n1p // bn1),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((8, n1p), lambda j, i: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((bn1, Dp), jnp.bfloat16),
            pltpu.VMEM((bn2, Dp), jnp.bfloat16),
            pltpu.VMEM((2, n1p), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=jax.ShapeDtypeStruct((8, n1p), jnp.float32),
        compiler_params=_tpu_params(),
    )(d1, d2)

    best_i = out[1, :n1].astype(jnp.int32)
    ty = (best_i // w2).reshape(h, w)
    tx = (best_i % w2).reshape(h, w)
    return ty, tx
