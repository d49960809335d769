#!/usr/bin/env python
"""Extract pooled encoder features for every sample of each dataset.

Capability parity with the reference's feature path used for t-SNE analysis:
``SkinClasDataset`` loads whole datasets with diagnosis labels
(``create_dataset.py:195-248``) and ``model(x, out_seg=False)`` returns the
pooled stage-4 feature (``mdvit.py:682-684``). Writes one ``.npz`` per
dataset with ``features (N, C)``, ``diagnosis_id (N,)`` (from the dataset's
``meta_<name>.csv``; zeros when absent/synthetic), ``domain_id (N,)``, and
``ids``.

Usage:
    python scripts/extract_features.py --model MDViT --ckpt results/run/best \
        --data_folder ./data/skin_lesion --dataset isic2018 PH2 DMF SKD \
        --img_size 256 --out features/
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mdvit_tpu.data.augment import eval_transform
from mdvit_tpu.data.datasets import build_domain_data, dataset_indices
from mdvit_tpu.data.loader import eval_batches
from mdvit_tpu.models.registry import get_model
from mdvit_tpu.train import checkpoints as ckpt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="MDViT")
    p.add_argument("--ckpt", required=False, default=None,
                   help="orbax checkpoint dir (params+batch_stats); random "
                        "init if omitted")
    p.add_argument("--data_folder", default="./data/skin_lesion")
    p.add_argument("--dataset", nargs="+",
                   default=["isic2018", "PH2", "DMF", "SKD"])
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--out", default="./features")
    p.add_argument("--model_kwargs", default=None,
                   help="JSON dict of architecture overrides (tiny models "
                        "for CPU smoke runs), e.g. "
                        '\'{"embed_dims": [8, 8, 8, 8]}\'')
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    num_domains = len(args.dataset)
    extra = {}
    if args.model_kwargs:
        import json

        extra = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in json.loads(args.model_kwargs).items()
        }
    model = get_model(args.model, img_size=args.img_size,
                      num_domains=num_domains, adapt_method="Sup", **extra)

    x0 = jnp.zeros((args.batch_size, args.img_size, args.img_size, 3))
    oh0 = jnp.zeros((args.batch_size, num_domains)).at[:, 0].set(1.0)
    variables = jax.jit(
        lambda k: model.init({"params": k, "dropout": k}, x0, oh0,
                             train=False, out_seg=False)
    )(jax.random.PRNGKey(0))
    if args.ckpt:
        restored = ckpt.restore_pytree(args.ckpt, {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        })
        variables = restored

    @jax.jit
    def feat_fn(variables, imgs, masks, onehot):
        x, _ = eval_transform(imgs, masks)
        out = model.apply(variables, x, onehot, train=False, out_seg=False)
        return out["feat"]

    data = build_domain_data(args.dataset, args.data_folder, args.img_size,
                             synthetic=args.synthetic)
    for di, name in enumerate(args.dataset):
        dom = data[name]["train"]
        onehot = np.zeros((args.batch_size, num_domains), np.float32)
        onehot[:, di] = 1.0
        feats = []
        for imgs, msks, valid in eval_batches(dom, args.batch_size):
            f = feat_fn(variables, jnp.asarray(imgs), jnp.asarray(msks),
                        jnp.asarray(onehot))
            feats.append(np.asarray(f)[:valid])
        feats = np.concatenate(feats) if feats else np.zeros((0, 1))
        # per-sample diagnosis labels from the dataset's meta csv, matched by
        # ID (SkinClasDataset's label channel, create_dataset.py:195-248);
        # zeros for synthetic corpora / missing csvs
        diag = np.zeros(len(feats), np.int64)
        meta_path = os.path.join(args.data_folder, name, f"meta_{name}.csv")
        if not args.synthetic and os.path.exists(meta_path):
            import pandas as pd

            meta = pd.read_csv(meta_path, dtype={"ID": str})
            if "diagnosis_id" in meta.columns:
                lut = dict(zip(meta["ID"], meta["diagnosis_id"]))
                diag = np.asarray(
                    [int(lut.get(str(s), 0)) for s in dom.ids], np.int64)
        out_path = os.path.join(args.out, f"features_{name}.npz")
        np.savez(out_path, features=feats, diagnosis_id=diag,
                 domain_id=np.full(len(feats), dataset_indices.get(name, di)),
                 ids=np.asarray(dom.ids))
        print(f"{name}: {feats.shape} -> {out_path}")


if __name__ == "__main__":
    main()
