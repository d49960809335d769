#!/usr/bin/env python
"""Summarize a training run's scalars.jsonl into a compact evidence JSON.

Extracts, per epoch: avg val Dice/IoU and the logged lr, plus the best
epoch and every lr transition — the numbers the README's convergence
tables are built from, without shipping the multi-MB scalar stream.

Usage: python scripts/summarize_run.py <exp_dir> [--epochs e1,e2,...]
       [--out summary.json]
"""
from __future__ import annotations

import argparse
import json
import os


def load(exp_dir: str) -> dict:
    val_iou, val_dice, lr = {}, {}, {}
    with open(os.path.join(exp_dir, "scalars.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            t = r["tag"]
            if t == "Val/Average/IOU":
                val_iou[r["step"]] = r["value"]
            elif t == "Val/Average/Di_score":
                val_dice[r["step"]] = r["value"]
            elif t == "Train/lr":
                lr[r["step"]] = r["value"]
    return {"val_iou": val_iou, "val_dice": val_dice, "lr": lr}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_dir")
    ap.add_argument("--epochs", default="",
                    help="comma-separated epochs to include explicitly")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    s = load(args.exp_dir)
    epochs = sorted(s["val_iou"])
    transitions = []
    prev = None
    for e in sorted(s["lr"]):
        if prev is not None and s["lr"][e] != prev:
            transitions.append({"epoch": e, "lr": s["lr"][e]})
        prev = s["lr"][e]
    best = max(epochs, key=lambda e: s["val_iou"][e]) if epochs else None
    pick = sorted({
        *(int(x) for x in args.epochs.split(",") if x),
        *(e for e in (0, epochs[-1] if epochs else 0) if e in s["val_iou"]),
        *(t["epoch"] for t in transitions),
    })
    summary = {
        "exp_dir": args.exp_dir,
        "epochs_run": len(epochs),
        "best_epoch": best,
        "best_val_iou": s["val_iou"].get(best),
        "lr_transitions": transitions,
        "epochs": [
            {"epoch": e, "val_dice": round(s["val_dice"].get(e, 0.0), 6),
             "val_iou": round(s["val_iou"].get(e, 0.0), 6),
             "lr": s["lr"].get(e)}
            for e in pick if e in s["val_iou"]
        ],
    }
    text = json.dumps(summary, indent=1)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
