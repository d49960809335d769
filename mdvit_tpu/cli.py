"""Training CLI — the TPU-native counterpart of the reference's
``multi_train_MDViT.py`` / ``multi_train_BASE.py`` / ``multi_train_TransFuse.py``
(one entry point; the model registry replaces the per-family scripts).

Installed as the ``mdvit-train`` console script; the repo-root ``train.py``
shim keeps the documented ``python train.py ...`` invocation working.

Example (4-domain MDViT, fold 4, reference recipe):
    mdvit-train --exp_name mdvit_f4 --model MDViT --batch_size 4 \
        --adapt_method Sup --dataset isic2018 PH2 DMF SKD --k_fold 4

Synthetic smoke run (no data on disk):
    mdvit-train --exp_name smoke --model MDViT --synthetic --debug
"""
from __future__ import annotations

import os
import time

from mdvit_tpu.config import build_argparser, config_from_args
from mdvit_tpu.train.trainer import Trainer


def main():
    args = build_argparser().parse_args()
    config = config_from_args(args)
    if config.tpu.get("distributed"):
        # multi-host: one process per host, same mesh extended over DCN;
        # coordinator discovery comes from the TPU pod environment
        import jax

        jax.distributed.initialize()
    # keep num_domains in sync with the dataset list (reference hardcodes
    # K=4 at multi_train_MDViT.py:469-471)
    config.model_adapt.num_domains = len(config.data.name)

    if args.exp_dir:
        exp_dir = args.exp_dir  # fixed dir → resumable across invocations
    else:
        stamp = time.strftime("%Y%m%d_%H%M")
        exp_dir = os.path.join(
            args.results_dir,
            f"{args.exp_name}_{config.model}_{stamp}_fold{config.data.k_fold}",
        )
    trainer = Trainer(config, exp_dir)

    if config.test.only_test:
        trainer.test(config.test.test_model_dir or None)
        return

    trainer.maybe_resume()
    trainer.fit()
    trainer.test()


if __name__ == "__main__":
    main()
