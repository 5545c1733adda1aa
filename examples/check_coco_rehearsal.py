#!/usr/bin/env python
"""Synthetic-COCO dress rehearsal of the whole COCO driver surface.

Generates a real on-disk COCO_ROOT (mask_rcnn_tpu.data.synthetic — image
files + instances_*.json with polygon/RLE/crowd annotations), then runs the
UNMODIFIED user journey exactly as the reference documents it
(reference examples/coco/train.py:16-46, evaluate_common.py:105-144):

    COCO_ROOT=... python examples/coco/train.py
    python examples/coco/evaluate.py logs/<ts>
    python examples/coco/demo.py logs/<ts> --images ...
    python examples/summarize_logs.py logs/

and asserts the logs/<ts>/ artifact contract (params.yaml, JSON log,
snapshot_model.npz, eval_result.yaml, visualizations) plus a nontrivial
mAP. This is the end-to-end seam test between the COCO json decode layer
and the drivers; the real-data parity runbook (docs/parity.md) is this
flow with the downloaded COCO_ROOT swapped in.

On a TPU chip (full driver defaults: min 800 / max 1333):
    python examples/check_coco_rehearsal.py --max-epoch 250
Tiny CPU smoke (same flow, small shapes):
    python examples/check_coco_rehearsal.py --min-size 96 --max-size 128 \
        --max-epoch 2 --min-map -1
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import os.path as osp
import subprocess
import sys
import tempfile

import numpy as np

HERE = osp.dirname(osp.abspath(__file__))
REPO = osp.dirname(HERE)
sys.path.insert(0, REPO)


def run(cmd, env=None, cwd=REPO):
    print(f"$ {' '.join(cmd)}", flush=True)
    res = subprocess.run(
        cmd, env=env, cwd=cwd, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    tail = res.stdout[-6000:]
    print(tail, flush=True)
    if res.returncode != 0:
        raise SystemExit(f"command failed ({res.returncode}): {cmd}")
    return res.stdout


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default=None,
                        help="default: a fresh temp dir")
    parser.add_argument("--max-epoch", type=float, default=250.0)
    parser.add_argument("--min-size", type=int, default=None,
                        help="override driver resize (default: the "
                        "unmodified 800/1333 COCO configuration)")
    parser.add_argument("--max-size", type=int, default=None)
    parser.add_argument("--image-hw", type=int, nargs=2, default=None,
                        help="synthetic image size (default: 480 640, or "
                        "96 128 when --min-size is overridden)")
    parser.add_argument("--compute-dtype", default=None,
                        choices=("float32", "bfloat16"))
    parser.add_argument("--eval-interval-epochs", type=float, default=None,
                        help="default: max_epoch/8, so the run spends its "
                        "time training rather than re-evaluating the tiny "
                        "val split every epoch")
    parser.add_argument("--min-map", type=float, default=0.5,
                        help="required validation/main/map@0.5 from the "
                        "evaluate step (-1 disables the bar for smoke "
                        "runs)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--n-train", type=int, default=8,
                        help="synthetic train2014 size")
    parser.add_argument("--n-val", type=int, default=4,
                        help="synthetic minival size (>=64 for the "
                        "statistically meaningful bf16-vs-f32 comparison)")
    args = parser.parse_args()

    from mask_rcnn_tpu.data.synthetic import make_synthetic_coco_root

    workdir = args.workdir or tempfile.mkdtemp(prefix="coco_rehearsal_")
    os.makedirs(workdir, exist_ok=True)
    hw = args.image_hw or ((96, 128) if args.min_size else (480, 640))
    coco_root = make_synthetic_coco_root(
        osp.join(workdir, "COCO"), height=hw[0], width=hw[1],
        n_train=args.n_train, n_minival=args.n_val,
        seed=args.seed,
    )
    logs_dir = osp.join(workdir, "logs")

    env = dict(os.environ, COCO_ROOT=coco_root)
    train_cmd = [
        sys.executable, osp.join(HERE, "coco", "train.py"),
        "--logs-dir", logs_dir,
        "--max-epoch", str(args.max_epoch),
        "--seed", str(args.seed),
        "--eval-interval-epochs",
        str(args.eval_interval_epochs
            if args.eval_interval_epochs is not None
            else max(args.max_epoch / 8, 1.0)),
    ]
    if args.min_size:
        train_cmd += ["--min-size", str(args.min_size)]
    if args.max_size:
        train_cmd += ["--max-size", str(args.max_size)]
    if args.compute_dtype:
        train_cmd += ["--compute-dtype", args.compute_dtype]
    run(train_cmd, env=env)

    # A reused --workdir (e.g. the documented f32-then-bf16 comparison)
    # accumulates one logs/<ts> dir per run; validate the newest.
    run_dirs = [d for d in sorted(glob.glob(osp.join(logs_dir, "*")))
                if osp.isdir(d)]
    assert run_dirs, f"train wrote no run dir under {logs_dir}"
    log_dir = run_dirs[-1]

    # -- artifact contract after train ------------------------------------
    for name in ("params.yaml", "log", "snapshot_model.npz"):
        assert osp.exists(osp.join(log_dir, name)), f"missing {name}"
    vis = glob.glob(osp.join(log_dir, "visualizations", "*.jpg"))
    assert vis, "train wrote no visualization tiles"
    with open(osp.join(log_dir, "log")) as f:
        entries = json.load(f)
    losses = [e["main/loss"] for e in entries if "main/loss" in e]
    assert losses and np.isfinite(losses).all(), "no finite losses"
    import yaml

    with open(osp.join(log_dir, "params.yaml")) as f:
        params_yaml = yaml.safe_load(f)
    assert params_yaml["dataset"] == "coco"
    assert "git_hash" in params_yaml and "model_config" in params_yaml

    # -- evaluate.py on the same log dir ----------------------------------
    run([sys.executable, osp.join(HERE, "coco", "evaluate.py"), log_dir],
        env=env)
    eval_path = osp.join(log_dir, "snapshot_model.npz.eval_result.yaml")
    assert osp.exists(eval_path), "evaluate.py wrote no eval_result.yaml"
    with open(eval_path) as f:
        eval_result = yaml.safe_load(f)
    map50 = eval_result.get("validation/main/map@0.5", float("nan"))
    print(f"rehearsal map@0.5 = {map50}")
    if args.min_map >= 0:
        assert map50 >= args.min_map, (
            f"map@0.5 {map50} < required {args.min_map}"
        )

    # -- demo.py on a val image --------------------------------------------
    demo_out = osp.join(workdir, "demo_out")
    val_img = sorted(glob.glob(osp.join(coco_root, "val2014", "*.png")))[0]
    run([sys.executable, osp.join(HERE, "coco", "demo.py"), log_dir,
         "--images", val_img, "--score-thresh", "0.3", "--out", demo_out],
        env=env)
    assert glob.glob(osp.join(demo_out, "*.png")), "demo saved no output"

    # -- summarize_logs.py over the logs dir -------------------------------
    table = run([sys.executable, osp.join(HERE, "summarize_logs.py"),
                 logs_dir], env=env)
    assert osp.basename(log_dir) in table
    assert "eval_map" in table

    summary = {
        "check": "coco_rehearsal",
        "map@0.5": float(map50),
        "map": float(eval_result.get("validation/main/map", float("nan"))),
        "steps": int(entries[-1].get("iteration", 0)),
        "log_dir": log_dir,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
