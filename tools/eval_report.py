#!/usr/bin/env python
"""Dataset evaluation dossier -> EVAL.md.

One command reproduces the whole table:
  python tools/make_eval_set.py --root evalset   # deterministic datasets
  python tools/eval_report.py  [--root evalset]  # runs cli.py --eval-dir

Every number comes from ``python -m eppm_tpu.cli --eval-dir`` (the same
entry point a user runs), once per dataset per engine, plus the bundled
Grove pair's photometric warp error (the reference repo ships no ground
truth — SURVEY.md §4).  Metric spec:
/root/reference/basic/bao_flow_tools.cpp:64-141.
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DATASETS = [
    ("middlebury_synth", "frame10.ppm,frame11.ppm,flow10.flo"),
    ("sintel_stress", "frame10.ppm,frame11.ppm,flow10.flo"),
    ("kitti_fixtures", "frame10.ppm,frame11.ppm,flow10.png"),
    ("real_texture", "frame10.ppm,frame11.ppm,flow10.flo"),
]
ENGINES = [
    ("dense", []),
    ("patchmatch", ["--set", "match_engine=patchmatch"]),
]


def run_eval(eval_dir, pattern, extra, border):
    cmd = [
        sys.executable, "-m", "eppm_tpu.cli",
        "--eval-dir", eval_dir, "--pattern", pattern,
        "--border", str(border), "--json", *extra,
    ]
    t0 = time.perf_counter()
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=ROOT, check=True
    )
    dt = time.perf_counter() - t0
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line), dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="evalset")
    p.add_argument("--border", type=int, default=12)
    p.add_argument("--out", default="EVAL.md")
    args = p.parse_args()
    root = os.path.join(ROOT, args.root)
    if not os.path.isdir(root):
        raise SystemExit(
            f"{root} missing — run: python tools/make_eval_set.py --root "
            f"{args.root}"
        )

    results = {}
    for ds, pattern in DATASETS:
        for ename, extra in ENGINES:
            print(f"evaluating {ds} / {ename} ...", flush=True)
            summary, dt = run_eval(
                os.path.join(root, ds), pattern, extra, args.border
            )
            results[(ds, ename)] = summary
            print(f"  mean EPE {summary['mean_epe']:.3f}  ({dt:.0f}s)",
                  flush=True)

    # Grove photometric warp error (no GT exists)
    import numpy as np

    sys.path.insert(0, ROOT)
    import jax
    import jax.numpy as jnp

    from eppm_tpu.cli import apply_overrides
    from eppm_tpu.config import DEFAULT_CONFIG
    from eppm_tpu.io import read_ppm
    from eppm_tpu.metrics import warp_error
    from eppm_tpu.pipeline import compute_flow_jit

    img1 = jnp.asarray(read_ppm("/root/reference/frame10.ppm"))
    img2 = jnp.asarray(read_ppm("/root/reference/frame11.ppm"))
    a1 = np.asarray(img1, np.float64) / 255.0
    a2 = np.asarray(img2, np.float64) / 255.0
    grove = {}
    for ename, extra in ENGINES:
        cfg = apply_overrides(DEFAULT_CONFIG, [e for e in extra if "=" in e])
        f = np.asarray(
            compute_flow_jit(img1, img2, jax.random.PRNGKey(0), cfg)
        )
        grove[ename] = warp_error(a1, a2, f)
    grove["zero-flow"] = warp_error(a1, a2, np.zeros(a1.shape[:2] + (2,)))

    lines = [
        "# EVAL — dataset accuracy dossier",
        "",
        "Per-sequence EPE / AAE(deg) / bad3 for both engines, produced by",
        "`python -m eppm_tpu.cli --eval-dir` on the deterministic synthetic",
        "datasets (`python tools/make_eval_set.py`; the reference repo",
        "bundles no ground truth and no runnable binary — SURVEY.md §4, §6).",
        f"Interior crop border={args.border}.  Metric spec:",
        "basic/bao_flow_tools.cpp:64-141.  Reproduce with:",
        "",
        "```",
        "python tools/make_eval_set.py --root evalset",
        "python tools/eval_report.py --root evalset",
        "```",
        "",
    ]
    for ds, _ in DATASETS:
        lines.append(f"## {ds}")
        lines.append("")
        lines.append(
            "| sequence | dense EPE | dense AAE | dense bad3 "
            "| PM EPE | PM AAE | PM bad3 |"
        )
        lines.append("|---|---|---|---|---|---|---|")
        seqs = results[(ds, "dense")]["sequences"]
        pm = results[(ds, "patchmatch")]["sequences"]
        for name in seqs:
            d = seqs[name]
            q = pm.get(name, {})
            lines.append(
                f"| {name} | {d['epe']:.3f} | {d['aae_deg']:.2f} "
                f"| {d['bad3']:.3f} | {q.get('epe', float('nan')):.3f} "
                f"| {q.get('aae_deg', float('nan')):.2f} "
                f"| {q.get('bad3', float('nan')):.3f} |"
            )
        md = results[(ds, "dense")]["mean_epe"]
        mp = results[(ds, "patchmatch")]["mean_epe"]
        lines.append(f"| **mean** | **{md:.3f}** | | | **{mp:.3f}** | | |")
        lines.append("")
    lines.append("## Grove (bundled Middlebury pair, no GT)")
    lines.append("")
    lines.append(
        f"Photometric warp error: dense {grove['dense']:.4f}, "
        f"patchmatch {grove['patchmatch']:.4f}, "
        f"zero-flow {grove['zero-flow']:.4f}."
    )
    lines.append("")
    out_path = os.path.join(ROOT, args.out)
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
