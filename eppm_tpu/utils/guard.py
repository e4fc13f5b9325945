"""Failure detection and recovery for production flow serving.

The reference has no failure-handling layer at all (``helper_cuda.h``
aborts the process on any CUDA error; ``main.cpp`` assumes every kernel
succeeded).  A serving deployment needs three things the reference never
provides, and this module supplies them as reusable pieces:

1. **Output validation** (`flow_sanity`, `FlowGuardError`): cheap,
   device-side checks that a produced flow field is structurally sound
   (finite, bounded magnitude, not sentinel-saturated) and, when frames
   are available, that it actually explains the motion (photometric warp
   error vs the zero-flow baseline — the same GT-free proxy bench.py
   gates on).

2. **Fault recovery** (`with_recovery`): the TPU runtime surfaces worker
   faults as ``RuntimeError``/``XlaRuntimeError`` on the *next* dispatch,
   and a crashed worker recovers for the following process or after a
   short pause (measured in this environment: ~30 s to first successful
   op).  `with_recovery` wraps a flow-producing callable, detects
   device-side faults (as opposed to user errors like shape mismatches),
   backs off, and retries a bounded number of times.

3. **Degraded-service detection** (`stable_throughput`): a recovering
   worker serves the first seconds of traffic 10-20x slower than steady
   state (measured 2026-08-17: 0.36 fps then 8.7 fps from the identical
   program).  `stable_throughput` measures batches until the per-item
   time stops improving, so callers report steady-state capacity rather
   than the recovery transient.  bench.py uses this.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import numpy as np

from ..config import UNKNOWN_FLOW_THRESH

__all__ = [
    "FlowGuardError",
    "FlowSanity",
    "flow_sanity",
    "check_flow",
    "is_device_fault",
    "with_recovery",
    "stable_throughput",
]


class FlowGuardError(RuntimeError):
    """A produced flow field failed validation."""

    def __init__(self, msg: str, report: "FlowSanity"):
        super().__init__(f"{msg}: {report}")
        self.report = report


@dataclass(frozen=True)
class FlowSanity:
    """Structural health report for one flow field."""

    finite_frac: float      # fraction of finite values
    unknown_frac: float     # fraction of UNKNOWN_FLOW-sentinel pixels
    max_mag: float          # max |flow| over finite, known pixels
    warp_ratio: Optional[float]  # warp_error / zero-flow warp_error

    def __str__(self) -> str:
        wr = "n/a" if self.warp_ratio is None else f"{self.warp_ratio:.3f}"
        return (
            f"finite={self.finite_frac:.4f} unknown={self.unknown_frac:.4f} "
            f"max|f|={self.max_mag:.1f} warp_ratio={wr}"
        )


def flow_sanity(
    flow: np.ndarray,
    img1: Optional[np.ndarray] = None,
    img2: Optional[np.ndarray] = None,
) -> FlowSanity:
    """Compute the health report for ``flow`` (host-side, (H, W, 2)).

    When both frames are given, also computes the photometric
    warp-error ratio vs the zero-flow baseline (< 1 means the flow
    explains at least some motion; bench gates at < 0.5-0.6).
    """
    f = np.asarray(flow)
    finite = np.isfinite(f)
    finite_frac = float(finite.mean()) if f.size else 1.0
    known = (
        finite.all(axis=-1)
        & (np.abs(np.where(finite, f, 0.0)) <= UNKNOWN_FLOW_THRESH).all(
            axis=-1
        )
    )
    unknown_frac = 1.0 - (float(known.mean()) if known.size else 1.0)
    if known.any():
        mags = np.linalg.norm(np.where(finite, f, 0.0), axis=-1)
        max_mag = float(mags[known].max())
    else:
        max_mag = float("inf")

    warp_ratio = None
    if img1 is not None and img2 is not None:
        from ..metrics import warp_error

        a1 = np.asarray(img1, np.float64)
        a2 = np.asarray(img2, np.float64)
        if a1.max() > 1.5:  # uint8-range frames
            a1, a2 = a1 / 255.0, a2 / 255.0
        fz = np.where(finite & (np.abs(f) <= UNKNOWN_FLOW_THRESH), f, 0.0)
        we = warp_error(a1, a2, fz.astype(np.float32))
        we0 = warp_error(a1, a2, np.zeros_like(fz, np.float32))
        warp_ratio = float(we / max(we0, 1e-12))
    return FlowSanity(finite_frac, unknown_frac, max_mag, warp_ratio)


def check_flow(
    flow: np.ndarray,
    img1: Optional[np.ndarray] = None,
    img2: Optional[np.ndarray] = None,
    *,
    max_unknown_frac: float = 0.5,
    max_mag: Optional[float] = None,
    max_warp_ratio: Optional[float] = None,
) -> FlowSanity:
    """Validate ``flow``; raise :class:`FlowGuardError` on failure.

    Defaults are deliberately loose (a hole-filled field should have ~0
    unknowns; 50% means the pipeline failed structurally).  Pass
    ``max_warp_ratio`` (with both frames) for a quality gate — e.g.
    0.6 per the bench gate.
    """
    rep = flow_sanity(flow, img1, img2)
    if rep.finite_frac < 1.0:
        raise FlowGuardError("non-finite flow values", rep)
    if rep.unknown_frac > max_unknown_frac:
        raise FlowGuardError(
            f"unknown-flow fraction > {max_unknown_frac}", rep
        )
    if max_mag is not None and rep.max_mag > max_mag:
        raise FlowGuardError(f"flow magnitude > {max_mag}", rep)
    if (
        max_warp_ratio is not None
        and rep.warp_ratio is not None
        and rep.warp_ratio > max_warp_ratio
    ):
        raise FlowGuardError(f"warp ratio > {max_warp_ratio}", rep)
    return rep


# Substrings that identify a *device/runtime* fault (retryable) as
# opposed to a user error (not retryable).  The axon tunnel and PJRT
# surface worker crashes with these markers.
_FAULT_MARKERS = (
    "worker process crashed",
    "UNAVAILABLE",
    "INTERNAL",
    "DEADLINE_EXCEEDED",
    "device is in an invalid state",
    "Unable to initialize backend",
)


def is_device_fault(exc: BaseException) -> bool:
    """Heuristic: does ``exc`` look like a TPU runtime fault (retryable)?"""
    if not isinstance(exc, (RuntimeError, OSError)):
        return False
    msg = str(exc)
    return any(m in msg for m in _FAULT_MARKERS)


def with_recovery(
    fn: Callable,
    *,
    retries: int = 2,
    backoff_s: float = 30.0,
    on_fault: Optional[Callable[[BaseException, int], None]] = None,
):
    """Wrap ``fn`` so device faults are retried after a backoff.

    A crashed TPU worker in this environment recovers for the next
    process / after ~30 s; anything that still fails after ``retries``
    attempts (or that is not a device fault) propagates.  ``on_fault``
    is called with (exception, attempt) before each backoff — use it
    for logging or cache invalidation.
    """

    def wrapped(*args, **kwargs):
        attempt = 0
        while True:
            try:
                return fn(*args, **kwargs)
            except Exception as e:  # noqa: BLE001 — filtered below
                if attempt >= retries or not is_device_fault(e):
                    raise
                if on_fault is not None:
                    on_fault(e, attempt)
                time.sleep(backoff_s * (attempt + 1))
                attempt += 1

    return wrapped


def stable_throughput(
    run_batch: Callable[[], Sequence],
    *,
    max_batches: int = 6,
    rel_improve: float = 0.05,
) -> float:
    """Best per-batch wall time once throughput stops improving.

    Runs ``run_batch`` (which must fully synchronize its results) up to
    ``max_batches`` times and returns the best batch seconds observed,
    stopping early once a batch fails to improve on the best by
    ``rel_improve`` — i.e. once the worker has left any post-crash
    degraded transient.
    """
    best = float("inf")
    for _ in range(max_batches):
        t0 = time.perf_counter()
        run_batch()
        cur = time.perf_counter() - t0
        improved = cur < (1.0 - rel_improve) * best
        best = min(best, cur)
        if not improved and best < float("inf"):
            break
    return best
