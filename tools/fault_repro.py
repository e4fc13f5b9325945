#!/usr/bin/env python
"""Minimal reproducer for the multi-heavy-subgraph TPU worker fault.

Observed on this runtime (TPU v5e, axon): an XLA module that contains TWO
heavyweight stencil subgraphs at 1080p-class sizes (two chained
dense-refine passes, or two coarse matchers) crashes the TPU worker
process ("TPU worker process crashed"), while each subgraph runs clean as
its own program.  This is why eppm_tpu/pipeline.py stages the pipeline
into per-pass programs above STAGED_PIPELINE_THRESHOLD pixels.

Each case runs in a SUBPROCESS so a worker crash is contained and the
harness can report PASS/FAULT per case.  Binary-searches the size
boundary when --search is given.

Usage:  python tools/fault_repro.py [--search]
"""

import argparse
import os
import subprocess
import sys
import textwrap

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CASE_SRC = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {root!r})
    import numpy as np
    import jax, jax.numpy as jnp
    from eppm_tpu.config import DEFAULT_CONFIG as cfg
    from eppm_tpu.ops.dense import dense_refine_flow
    from eppm_tpu.ops.census import census_transform
    from eppm_tpu.ops.cost import pack_frame

    h, w = {h}, {w}
    n_passes = {n_passes}
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.random((h, w, 3), np.float32))
    img2 = jnp.asarray(rng.random((h, w, 3), np.float32))

    @jax.jit
    def prog(i1, i2):
        p1 = pack_frame(i1, census_transform(i1))
        p2 = pack_frame(i2, census_transform(i2))
        flow = jnp.zeros((h, w, 2), jnp.float32)
        for _ in range(n_passes):
            flow = dense_refine_flow(
                flow, p1, p2, cfg.cost, cfg.dense_search_radius, True,
                cfg.cost_tap_chunk,
            )
        return jnp.sum(flow)

    out = prog(img1, img2)
    print("RESULT", float(out))
    """
)


def run_case(h, w, n_passes, timeout=900):
    src = CASE_SRC.format(root=ROOT, h=h, w=w, n_passes=n_passes)
    try:
        p = subprocess.run(
            [sys.executable, "-c", src], capture_output=True, text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return "TIMEOUT", ""
    if p.returncode == 0 and "RESULT" in p.stdout:
        return "PASS", ""
    tail = (p.stderr or "").strip().splitlines()[-3:]
    return "FAULT", " | ".join(tail)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--search", action="store_true",
                    help="binary-search the faulting pixel count")
    args = ap.parse_args()

    cases = [
        ("1080p, 1 refine pass (control)", 1080, 1920, 1),
        ("1080p, 2 refine passes (repro)", 1080, 1920, 2),
        ("540p, 2 refine passes (control)", 540, 960, 2),
    ]
    for name, h, w, n in cases:
        status, detail = run_case(h, w, n)
        print(f"{name:38s} {status}  {detail}", flush=True)

    if args.search:
        lo, hi = 540, 1080  # heights at 16:9, 2 passes
        while hi - lo > 30:
            mid = (lo + hi) // 2
            w = int(mid * 16 / 9) // 8 * 8
            status, _ = run_case(mid, w, 2)
            print(f"  search h={mid} ({mid}x{w}): {status}", flush=True)
            if status == "PASS":
                lo = mid
            else:
                hi = mid
        print(f"fault boundary: ~{lo}p passes, ~{hi}p faults (2 passes)")


if __name__ == "__main__":
    main()
