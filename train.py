#!/usr/bin/env python
"""Repo-root shim for the training CLI (see ``mdvit_tpu/cli.py``; also
installed as the ``mdvit-train`` console script).

Example (4-domain MDViT, fold 4, reference recipe):
    python train.py --exp_name mdvit_f4 --model MDViT --batch_size 4 \
        --adapt_method Sup --dataset isic2018 PH2 DMF SKD --k_fold 4

Synthetic smoke run (no data on disk):
    python train.py --exp_name smoke --model MDViT --synthetic --debug
"""
from mdvit_tpu.cli import main

if __name__ == "__main__":
    main()
