#!/usr/bin/env python
"""Multi-resolution benchmark table -> BENCH_TABLE.json.

Sibling of bench.py (which emits the single driver-facing JSON line):
measures steady-state single-chip wall time at the BASELINE config
shapes — Grove 640x480, KITTI 1242x375, 1080p, 4K — so rounds are
comparable on more than the headline number.

Timing includes full host readback of the flow (the serving contract);
through the axon tunnel the readback floor (~45 MB/s) dominates large
outputs, so `device_ms` (scalar-reduced sync, compute-only) is recorded
alongside `e2e_ms`.

Usage: python tools/bench_table.py [--out BENCH_TABLE.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def synthetic_pair(h, w, seed=0):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.float32)
    for scale, amp in ((16, 0.6), (4, 0.3)):
        small = rng.random((h // scale + 2, w // scale + 2, 3)).astype(
            np.float32
        )
        img += amp * np.asarray(
            jax.image.resize(jnp.asarray(small), (h, w, 3), "linear")
        )
    img2 = np.clip(img, 0, 1)
    img1 = np.roll(img2, (-5, -3), axis=(1, 0))
    return jnp.asarray(img1), jnp.asarray(img2)


def time_shape(name, img1, img2, n=3, cfg=None):
    import jax
    import jax.numpy as jnp

    from eppm_tpu.config import DEFAULT_CONFIG
    from eppm_tpu.pipeline import compute_flow_jit

    if cfg is None:
        cfg = DEFAULT_CONFIG

    # compile + warm
    f = compute_flow_jit(img1, img2, jax.random.PRNGKey(0), cfg)
    np.asarray(f)

    # end-to-end: includes full flow readback
    e2e = []
    for i in range(n):
        t0 = time.perf_counter()
        f = compute_flow_jit(img1, img2, jax.random.PRNGKey(i), cfg)
        np.asarray(f)
        e2e.append(time.perf_counter() - t0)

    # device-only: fetch a single element (4 bytes through the tunnel
    # forces completion of the final stage, which chains on all earlier
    # stages; cannot wrap in an outer jit — at 1080p+ the pipeline is
    # deliberately staged into separate programs, see pipeline.py)
    dev = []
    for i in range(n):
        t0 = time.perf_counter()
        f = compute_flow_jit(img1, img2, jax.random.PRNGKey(100 + i), cfg)
        np.asarray(f[:1, :1])
        dev.append(time.perf_counter() - t0)

    row = {
        "shape": list(img1.shape[:2]),
        "e2e_ms": round(min(e2e) * 1e3, 1),
        "device_ms": round(min(dev) * 1e3, 1),
        "fps_e2e": round(1.0 / min(e2e), 3),
    }
    print(f"{name:18s} {row['e2e_ms']:9.1f} ms e2e  "
          f"{row['device_ms']:9.1f} ms device", flush=True)
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(ROOT, "BENCH_TABLE.json"))
    p.add_argument(
        "--set", action="append", default=[], metavar="K=V", dest="sets",
        help="config overrides (incl. preset=NAME); required to also "
        "pass a non-default --out so the default-config table is never "
        "overwritten by a variant run",
    )
    args = p.parse_args()
    if args.sets and args.out == os.path.join(ROOT, "BENCH_TABLE.json"):
        raise SystemExit("--set requires a non-default --out")
    import jax
    import jax.numpy as jnp

    from eppm_tpu.cli import apply_overrides
    from eppm_tpu.config import DEFAULT_CONFIG
    from eppm_tpu.io import read_ppm

    cfg = apply_overrides(DEFAULT_CONFIG, args.sets)

    table = {}
    img1 = jnp.asarray(read_ppm("/root/reference/frame10.ppm"))
    img2 = jnp.asarray(read_ppm("/root/reference/frame11.ppm"))
    table["grove_640x480"] = time_shape("grove_640x480", img1, img2, cfg=cfg)
    table["kitti_1242x375"] = time_shape(
        "kitti_1242x375", *synthetic_pair(375, 1242), cfg=cfg
    )
    table["hd_1080p"] = time_shape(
        "hd_1080p", *synthetic_pair(1080, 1920), cfg=cfg
    )
    table["uhd_4k"] = time_shape(
        "uhd_4k", *synthetic_pair(2160, 3840), n=2, cfg=cfg
    )
    table["device"] = str(jax.devices()[0])
    if args.sets:
        table["overrides"] = list(args.sets)
    with open(args.out, "w") as f:
        json.dump(table, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
