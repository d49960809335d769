#!/usr/bin/env python
"""K-fold result aggregator — the script version of the reference's
``Evaluation/k_fold_val.ipynb`` (cells 2-5): stack each fold's
``test_results.csv``, report mean±std per dataset, write ``k_fold.csv``.

Usage:
    python scripts/kfold_aggregate.py --exp_dirs results/run_fold0 ... \
        --out k_fold.csv
"""
from __future__ import annotations

import argparse
import os

import pandas as pd


def aggregate(exp_dirs: list[str]) -> pd.DataFrame:
    frames = []
    for d in exp_dirs:
        path = os.path.join(d, "test_results.csv")
        df = pd.read_csv(path)
        df["fold"] = d
        frames.append(df)
    allf = pd.concat(frames, ignore_index=True)
    rows = []
    for name, grp in allf.groupby("Name", sort=False):
        rows.append({
            "Name": name,
            "Di_score_mean": grp["Di_score"].mean(),
            "Di_score_std": grp["Di_score"].std(ddof=1),
            "IOU_mean": grp["IOU"].mean(),
            "IOU_std": grp["IOU"].std(ddof=1),
            "loss_mean": grp["loss"].mean(),
            "n_folds": len(grp),
        })
    return pd.DataFrame(rows)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp_dirs", nargs="+", required=True)
    p.add_argument("--out", default="k_fold.csv")
    args = p.parse_args()
    df = aggregate(args.exp_dirs)
    df.to_csv(args.out, index=False)
    print(df.to_string(index=False))


if __name__ == "__main__":
    main()
