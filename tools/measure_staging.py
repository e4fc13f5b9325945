#!/usr/bin/env python
"""Measure monolithic vs staged pipeline dispatch at large sizes.

Round-4 verdict items 5+6: the 1080p+ staged path exists because a
monolithic module faulted the TPU worker in rounds 1-3, but the round-4
probe runs PASS — so the threshold must be re-justified by measurement,
and the single-pair e2e gap (712.7 ms e2e vs 211.6 ms device at 1080p,
BENCH_TABLE r4) needs attribution: ~20 staged dispatches each pay the
~24 ms tunnel round trip.

For each shape x path this prints device ms (scalar-reduced sync) and
e2e ms (full q16 readback), plus the dispatch count of the staged path.
The monolithic leg runs in a SUBPROCESS first (worker-crash containment,
tools/fault_repro.py pattern); its timing only counts if the probe
passes.

Usage: python tools/measure_staging.py [1080x1920 ...]
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SHAPES = sys.argv[1:] or ["1080x1920", "2160x3840"]


def synth(h, w):
    import numpy as np
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    small = rng.random((h // 8 + 2, w // 8 + 2, 3)).astype(np.float32)
    base = np.asarray(
        jax.image.resize(jnp.asarray(small), (h, w, 3), "linear")
    )
    img2 = jnp.asarray(np.clip(base + 0.1 * rng.random((h, w, 3)), 0, 1))
    img1 = jnp.asarray(np.roll(np.asarray(img2), (-5, -3), axis=(1, 0)))
    return img1, img2


def time_path(kind, h, w, n=3):
    """kind: 'staged' | 'monolithic'.  Returns (device_ms, e2e_ms)."""
    import numpy as np
    import jax

    import eppm_tpu.pipeline as P
    from eppm_tpu.config import DEFAULT_CONFIG

    if kind == "monolithic":
        P.STAGED_PIPELINE_THRESHOLD = 1 << 62
    img1, img2 = synth(h, w)
    key = jax.random.PRNGKey(0)

    flow = P.compute_flow_jit(img1, img2, key, DEFAULT_CONFIG)
    float(flow[0, 0, 0])  # compile + settle

    dev, e2e = [], []
    for _ in range(n):
        t0 = time.perf_counter()
        flow = P.compute_flow_jit(img1, img2, key, DEFAULT_CONFIG)
        float(jax.numpy.sum(flow))  # scalar-reduced device sync
        dev.append(time.perf_counter() - t0)
    for _ in range(n):
        t0 = time.perf_counter()
        flow = P.compute_flow_jit(img1, img2, key, DEFAULT_CONFIG)
        np.asarray(flow)  # full readback through the tunnel
        e2e.append(time.perf_counter() - t0)
    return min(dev) * 1000, min(e2e) * 1000


def main():
    if os.environ.get("EPPM_STAGING_CHILD"):
        kind, h, w = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
        d, e = time_path(kind, h, w)
        print(json.dumps({"device_ms": round(d, 1), "e2e_ms": round(e, 1)}))
        return

    for shape in SHAPES:
        h, w = (int(v) for v in shape.split("x"))
        for kind in ("monolithic", "staged"):
            env = dict(os.environ, EPPM_STAGING_CHILD="1")
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), kind,
                 str(h), str(w)],
                capture_output=True, text=True, env=env, cwd=ROOT,
                timeout=3000,
            )
            if out.returncode != 0:
                tail = (out.stderr or "").strip().splitlines()[-3:]
                print(f"{shape} {kind}: FAILED rc={out.returncode} "
                      f"{' | '.join(tail)}", flush=True)
                continue
            res = json.loads(out.stdout.strip().splitlines()[-1])
            print(f"{shape} {kind}: device {res['device_ms']} ms, "
                  f"e2e {res['e2e_ms']} ms", flush=True)


if __name__ == "__main__":
    main()
