#!/usr/bin/env python
"""Offline preprocessing: raw images/masks → 512² ``.npy`` + ``meta_*.csv``.

Capability parity with ``Datasets/process_resize.py`` (per-dataset resize to
512², images INTER_CUBIC-ish / masks nearest, saved as npy under
``<ds>/Image``, ``<ds>/Label``) and the meta-csv builder notebook
(``Datasets/create_meta.ipynb``) — without the cv2/matplotlib dependency
(PIL + numpy only; PIL.BICUBIC for images, NEAREST for masks).

Usage:
    python scripts/preprocess.py --dataset isic2018 \
        --images /raw/ISIC2018_Task1-2_Training_Input \
        --masks /raw/ISIC2018_Task1_Training_GroundTruth \
        --out ./data/skin_lesion
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

SIZE = 512


def _load_resize(path: str, nearest: bool) -> np.ndarray:
    if Image is None:
        raise RuntimeError("PIL not available; cannot decode raw images")
    img = Image.open(path)
    resample = Image.NEAREST if nearest else Image.BICUBIC
    img = img.resize((SIZE, SIZE), resample)
    return np.asarray(img)


def mask_id_for(dataset: str, image_id: str) -> str:
    """Reference mask-file naming conventions (process_resize.py):
    ISIC: <id>_segmentation; PH2: <id>_lesion; DMF/SKD: same id."""
    if dataset == "isic2018":
        return image_id + "_segmentation"
    if dataset == "PH2":
        return image_id + "_lesion"
    return image_id


def process(dataset: str, images_dir: str, masks_dir: str, out_root: str):
    out = os.path.join(out_root, dataset)
    os.makedirs(os.path.join(out, "Image"), exist_ok=True)
    os.makedirs(os.path.join(out, "Label"), exist_ok=True)
    rows = []
    exts = (".jpg", ".jpeg", ".png", ".bmp")
    for fn in sorted(os.listdir(images_dir)):
        stem, ext = os.path.splitext(fn)
        if ext.lower() not in exts:
            continue
        img = _load_resize(os.path.join(images_dir, fn), nearest=False)
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        mask_stem = mask_id_for(dataset, stem)
        mask_path = None
        for mext in exts:
            cand = os.path.join(masks_dir, mask_stem + mext)
            if os.path.exists(cand):
                mask_path = cand
                break
        if mask_path is None:
            print(f"skip {stem}: no mask")
            continue
        mask = _load_resize(mask_path, nearest=True)
        if mask.ndim == 3:
            mask = mask[..., 0]
        mask = (mask > 127).astype(np.uint8)
        np.save(os.path.join(out, "Image", f"{stem}.npy"),
                img[..., :3].astype(np.uint8))
        np.save(os.path.join(out, "Label", f"{stem}.npy"), mask)
        rows.append({"ID": stem, "diagnosis": "unknown", "diagnosis_id": 0,
                     "dataset": dataset})
    pd.DataFrame(rows).to_csv(
        os.path.join(out, f"meta_{dataset}.csv"), index=False)
    print(f"{dataset}: wrote {len(rows)} samples to {out}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True,
                   choices=["isic2018", "PH2", "DMF", "SKD"])
    p.add_argument("--images", required=True)
    p.add_argument("--masks", required=True)
    p.add_argument("--out", default="./data/skin_lesion")
    args = p.parse_args()
    process(args.dataset, args.images, args.masks, args.out)


if __name__ == "__main__":
    main()
