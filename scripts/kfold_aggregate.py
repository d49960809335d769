#!/usr/bin/env python
"""K-fold result aggregator — the script version of the reference's
``Evaluation/k_fold_val.ipynb`` (cells 2-5): stack each fold's
``test_results.csv`` positionally, mean/std over folds per numeric column,
write ``k_fold.csv`` with the notebook's ``<col>_m`` / ``<col>_s`` schema.
Std is population std (the notebook uses ``np.std``, ddof=0).

Usage:
    python scripts/kfold_aggregate.py --exp_dirs results/run_fold0 ... \
        --out k_fold.csv
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd


def aggregate(exp_dirs: list[str]) -> pd.DataFrame:
    frames = []
    for d in exp_dirs:
        path = os.path.join(d, "test_results.csv")
        frames.append(pd.read_csv(path))
    # cells 3-4 stack over folds; the notebook stacks POSITIONALLY, which
    # silently averages mismatched datasets if a fold's rows are ordered
    # differently — key the rows by the Name column instead and refuse
    # non-matching folds
    head = frames[0].columns
    names = list(frames[0][head[0]])
    aligned = [frames[0]]
    for d, f in zip(exp_dirs[1:], frames[1:]):
        g = f.set_index(head[0])
        missing = [n for n in names if n not in g.index]
        extra = [n for n in g.index if n not in names]
        if missing or extra:
            raise SystemExit(
                f"{d}/test_results.csv rows do not match fold 0"
                f" (missing {missing}, extra {extra})"
            )
        aligned.append(g.loc[names].reset_index())
    arr = np.stack([f.values for f in aligned], axis=0)
    vals = arr[:, :, 1:].astype(float)
    avg = np.mean(vals, axis=0)
    std = np.std(vals, axis=0)  # population std — notebook cell 4
    # cell 5 schema: Name column then <col>_m, <col>_s pairs in csv order
    data = {head[0]: arr[0, :, 0]}
    for j, col in enumerate(head[1:]):
        data[f"{col}_m"] = avg[:, j]
        data[f"{col}_s"] = std[:, j]
    return pd.DataFrame(data)


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
