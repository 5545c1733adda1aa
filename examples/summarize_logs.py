#!/usr/bin/env python
"""Tabulate all runs under logs/ (reference examples/summarize_logs.py
parity): params.yaml + JSON log + eval_result.yaml -> one table."""

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def summarize_one(log_dir):
    import yaml

    row = {"log_dir": osp.basename(log_dir)}
    params_path = osp.join(log_dir, "params.yaml")
    if osp.exists(params_path):
        with open(params_path) as f:
            p = yaml.safe_load(f) or {}
        row["model"] = p.get("model", p.get("model_config", {}).get(
            "n_layers"))
        row["dataset"] = p.get("dataset")
        row["batch_size"] = p.get("batch_size")
        row["lr"] = p.get("lr")
        row["git_hash"] = p.get("git_hash")
        row["hostname"] = p.get("hostname")
    log_path = osp.join(log_dir, "log")
    if osp.exists(log_path):
        try:
            with open(log_path) as f:
                entries = json.load(f)
        except json.JSONDecodeError:
            entries = []
        maps = [
            e["validation/main/map"]
            for e in entries
            if "validation/main/map" in e
        ]
        if maps:
            row["best_map"] = max(maps)
        if entries:
            row["iteration"] = entries[-1].get("iteration")
            row["elapsed"] = entries[-1].get("elapsed_time")
    eval_path = osp.join(log_dir, "snapshot_model.npz.eval_result.yaml")
    if osp.exists(eval_path):
        with open(eval_path) as f:
            ev = yaml.safe_load(f) or {}
        row["eval_map"] = ev.get("validation/main/map")
    return row


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("logs_dir", nargs="?", default="logs")
    args = parser.parse_args()

    import glob

    import pandas as pd
    import tabulate

    rows = [
        summarize_one(d)
        for d in sorted(glob.glob(osp.join(args.logs_dir, "*")))
        if osp.isdir(d)
    ]
    if not rows:
        print(f"no runs under {args.logs_dir}")
        return
    df = pd.DataFrame(rows)
    print(tabulate.tabulate(df, headers="keys", tablefmt="simple",
                            showindex=False))


if __name__ == "__main__":
    main()
