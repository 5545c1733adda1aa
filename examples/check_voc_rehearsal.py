#!/usr/bin/env python
"""Synthetic-SBD dress rehearsal of the whole VOC driver surface.

Generates a real on-disk SBD root (mask_rcnn_tpu.data.synthetic — img/*.jpg
+ GTcls/GTinst .mat structs + SDS-layout split lists), then runs the
UNMODIFIED user journey exactly as the reference documents it
(reference examples/voc/train.py:14-35, examples/voc/evaluate.py):

    SBD_ROOT=... python examples/voc/train.py
    SBD_ROOT=... python examples/voc/evaluate.py logs/<ts>
    python examples/voc/demo.py logs/<ts> --images ...
    python examples/summarize_logs.py logs/

and asserts the logs/<ts>/ artifact contract (params.yaml, JSON log,
snapshot_model.npz, eval_result.yaml, visualizations) plus a nontrivial
mAP@50 under the VOC 07-metric. The COCO twin is check_coco_rehearsal.py;
together they rehearse both reference user journeys end-to-end.

On a TPU chip (full driver defaults: min 600 / max 1000):
    python examples/check_voc_rehearsal.py --max-epoch 150
Tiny CPU smoke (same flow, small shapes):
    python examples/check_voc_rehearsal.py --min-size 96 --max-size 128 \
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
    parser.add_argument("--max-epoch", type=float, default=150.0)
    parser.add_argument("--min-size", type=int, default=None,
                        help="override driver resize (default: the "
                        "unmodified 600/1000 VOC configuration)")
    parser.add_argument("--max-size", type=int, default=None)
    parser.add_argument("--image-hw", type=int, nargs=2, default=None,
                        help="synthetic image size (default: 360 480, or "
                        "96 128 when --min-size is overridden)")
    parser.add_argument("--compute-dtype", default=None,
                        choices=("float32", "bfloat16"))
    parser.add_argument("--eval-interval-epochs", type=float, default=None,
                        help="default: max_epoch/8")
    parser.add_argument("--min-map", type=float, default=0.5,
                        help="required validation/main/map (VOC 07-metric "
                        "AP@50) from the evaluate step (-1 disables the "
                        "bar for smoke runs)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from mask_rcnn_tpu.data.synthetic import make_synthetic_sbd_root

    workdir = args.workdir or tempfile.mkdtemp(prefix="voc_rehearsal_")
    os.makedirs(workdir, exist_ok=True)
    hw = args.image_hw or ((96, 128) if args.min_size else (360, 480))
    sbd_root = make_synthetic_sbd_root(
        osp.join(workdir, "SBD"), height=hw[0], width=hw[1],
        seed=args.seed,
    )
    logs_dir = osp.join(workdir, "logs")

    env = dict(os.environ, SBD_ROOT=sbd_root)
    train_cmd = [
        sys.executable, osp.join(HERE, "voc", "train.py"),
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
    assert params_yaml["dataset"] == "voc"
    assert "git_hash" in params_yaml and "model_config" in params_yaml

    # -- evaluate.py on the same log dir (VOC 07-metric) -------------------
    run([sys.executable, osp.join(HERE, "voc", "evaluate.py"), log_dir],
        env=env)
    eval_path = osp.join(log_dir, "snapshot_model.npz.eval_result.yaml")
    assert osp.exists(eval_path), "evaluate.py wrote no eval_result.yaml"
    with open(eval_path) as f:
        eval_result = yaml.safe_load(f)
    map50 = eval_result.get("validation/main/map", float("nan"))
    print(f"rehearsal VOC map (07-metric AP@50) = {map50}")
    if args.min_map >= 0:
        assert map50 >= args.min_map, (
            f"map {map50} < required {args.min_map}"
        )

    # -- demo.py on a val image --------------------------------------------
    demo_out = osp.join(workdir, "demo_out")
    with open(osp.join(sbd_root, "ImageSets/Main/val.txt")) as f:
        val_id = f.readline().strip()
    val_img = osp.join(sbd_root, "img", val_id + ".jpg")
    run([sys.executable, osp.join(HERE, "voc", "demo.py"), log_dir,
         "--images", val_img, "--score-thresh", "0.3", "--out", demo_out],
        env=env)
    assert glob.glob(osp.join(demo_out, "*")), "demo saved no output"

    # -- summarize_logs.py over the logs dir -------------------------------
    table = run([sys.executable, osp.join(HERE, "summarize_logs.py"),
                 logs_dir], env=env)
    assert osp.basename(log_dir) in table
    assert "eval_map" in table

    summary = {
        "check": "voc_rehearsal",
        "map": float(map50),
        "steps": int(entries[-1].get("iteration", 0)),
        "log_dir": log_dir,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
