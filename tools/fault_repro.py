#!/usr/bin/env python
"""Minimal reproducer for the heavyweight-module TPU worker fault.

Observed on this runtime (TPU v5e, axon): an XLA module containing the
FULL monolithic 1080p pipeline crashes the TPU worker process ("TPU
worker process crashed ... kernel fault"), while the same stages run
clean as separate programs.  This is why eppm_tpu/pipeline.py stages the
pipeline into per-pass programs above STAGED_PIPELINE_THRESHOLD pixels.

History: in round 1 (100-tap stride-2 cost) TWO chained 1080p refine
passes in one module were enough to fault; with the round-2 49-tap
subgraphs that pair PASSES (verified 2026-08-17) and the smallest known
repro is the full monolithic pipeline module — the fault tracks total
module weight, not any single stage.

Each case runs in a SUBPROCESS so a worker crash is contained and the
harness can report PASS/FAULT per case.  Binary-searches the refine-pass
count boundary when --search is given.

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

FULL_SRC = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {root!r})
    import numpy as np
    import jax, jax.numpy as jnp
    import eppm_tpu.pipeline as P
    from eppm_tpu.config import DEFAULT_CONFIG

    h, w = {h}, {w}
    rng = np.random.default_rng(0)
    small = rng.random((h // 8 + 2, w // 8 + 2, 3)).astype(np.float32)
    img = np.clip(np.asarray(jax.image.resize(
        jnp.asarray(small), (h, w, 3), "linear")), 0, 1)
    img1 = jnp.asarray(np.roll(img, (-5, -3), axis=(1, 0)))
    img2 = jnp.asarray(img)
    f = P._compute_flow_one_program(
        img1, img2, jax.random.PRNGKey(0), DEFAULT_CONFIG, False
    )
    print("RESULT", float(jnp.sum(f)))
    """
)


MULTIWARP_SRC = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {root!r})
    import numpy as np
    import jax, jax.numpy as jnp
    from eppm_tpu.config import DEFAULT_CONFIG as cfg
    from eppm_tpu.ops.census import census_transform
    from eppm_tpu.ops.cost import pack_frame
    from eppm_tpu.ops.pallas_cost import residual_costs_multiwarp_pallas

    h, w, k = {h}, {w}, {k}
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.random((h, w, 3), np.float32))
    p1 = pack_frame(img1, census_transform(img1))
    warped = jnp.asarray(rng.random((k, h, w, 4), np.float32))

    @jax.jit
    def prog(p1, warped):
        return jnp.sum(residual_costs_multiwarp_pallas(p1, warped, cfg.cost))

    print("RESULT", float(prog(p1, warped)))
    """
)


def run_case(h, w, n_passes, timeout=2400):
    if n_passes == "full":
        src = FULL_SRC.format(root=ROOT, h=h, w=w)
    elif isinstance(n_passes, str) and n_passes.startswith("multiwarp"):
        src = MULTIWARP_SRC.format(root=ROOT, h=h, w=w,
                                   k=int(n_passes.split(":")[1]))
    else:
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
        ("1080p, 2 refine passes (round-1 repro; now passes)",
         1080, 1920, 2),
        ("1080p, FULL monolithic pipeline (current repro)",
         1080, 1920, "full"),
        ("540p, FULL monolithic pipeline (control)", 540, 960, "full"),
        # 4K-coarse-at-fixed-depth-3 size (518k px, K=5 as in
        # propagate_dense) — probes the ops/match.py rescore_multi gate.
        # NB: with PyramidConfig.auto_depth_dim=160 (default) no BASELINE
        # config reaches this size at the coarse level; the gate matters
        # only for user configs that pin max_depth with auto_depth off.
        ("multiwarp kernel 540x960 K=5 (518k px)", 540, 960, "multiwarp:5"),
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
