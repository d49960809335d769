#!/usr/bin/env python
"""Offline preprocessing: raw images/masks → 512² ``.npy`` + ``meta_*.csv``.

Capability parity with ``Datasets/process_resize.py`` (per-dataset resize to
512² with the reference's interpolation kernels — see ``RESAMPLE``; saved as
npy under ``<ds>/Image``, ``<ds>/Label``) AND the meta-csv builder notebook
(``Datasets/create_meta.ipynb``) — without the cv2/matplotlib dependency
(PIL + numpy only).

Corpus definitions (reference parity):
  * isic2018 — ONLY the 2,594-image subset pinned by the reference's
    ``Datasets/isic2018_id.csv``; vendored (derived) as
    ``mdvit_tpu/data/isic2018_subset.csv`` with the notebook's transforms
    applied (ID = numeric part, diagnosis = Class.capitalize(),
    diagnosis_id = category codes). npy files are named by numeric id
    (``process_resize.py:40``).
  * PH2 — flat ``<id>.bmp`` images + ``<id>_lesion`` masks; diagnosis from
    the PH2 xlsx (``create_meta.ipynb`` cells 5-8: first X among
    Common Nevus / Atypical Nevus / Melanoma).
  * DMF — nested ``<id>/<id>.png`` + ``<id>mask.png``
    (``process_resize.py:134-145``); diagnosis = ``dx.title()`` from the
    Dermofit ``meta.csv`` (notebook cells 9-13).
  * SKD — ``skin_data/{melanoma,notmelanoma}/{dermis,dermquest}/*.jpg`` with
    ``*contour.png`` masks (``process_resize.py:97-110``); id =
    ``<subset>_<stem>``, diagnosis Melanoma/Benign (notebook cells 14-19).

Usage:
    python scripts/preprocess.py --dataset isic2018 \
        --images /raw/ISIC2018_Task1-2_Training_Input \
        --masks /raw/ISIC2018_Task1_Training_GroundTruth \
        --out ./data/skin_lesion
    python scripts/preprocess.py --dataset PH2 --images ... --masks ... \
        --meta /raw/PH2Dataset/PH2_dataset.xlsx --out ...
    python scripts/preprocess.py --dataset DMF --images /raw/DMF_origin/images \
        --meta /raw/DMF_origin/meta.csv --out ...
    python scripts/preprocess.py --dataset SKD --images /raw/skin_cancer_detection \
        --out ...
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
EXTS = (".jpg", ".jpeg", ".png", ".bmp")

# Per-dataset interpolation parity with the reference
# (``Datasets/process_resize.py``): ISIC images INTER_CUBIC / masks
# INTER_NEAREST (``:45-46``); PH2/SKD/DMF images AND masks INTER_AREA
# (``:76-77,114-115,147-149``). PIL's BOX filter is the area-average
# equivalent of cv2.INTER_AREA for downscaling. Area-resized masks are
# binarized at >0.5 by ``_save_pair`` — the same threshold the reference's
# dataset applies at load time (``create_dataset.py:131``), so the
# end-to-end labels match.
RESAMPLE = {
    "isic2018": {"image": "BICUBIC", "mask": "NEAREST"},
    "PH2": {"image": "BOX", "mask": "BOX"},
    "DMF": {"image": "BOX", "mask": "BOX"},
    "SKD": {"image": "BOX", "mask": "BOX"},
}
ISIC_SUBSET_CSV = os.path.join(
    os.path.dirname(__file__), "..", "mdvit_tpu", "data",
    "isic2018_subset.csv",
)


def load_isic_subset() -> pd.DataFrame:
    """The reference's 2,594-id ISIC2018 corpus (diagnosis included)."""
    df = pd.read_csv(ISIC_SUBSET_CSV, dtype={"ID": str})
    assert len(df) == 2594, f"subset table corrupt: {len(df)} rows"
    return df


def resize_array(arr: np.ndarray, resample: str,
                 size: int = SIZE) -> np.ndarray:
    """Resize a numpy image with the named PIL kernel (testable core of
    ``_load_resize``)."""
    if Image is None:
        raise RuntimeError("PIL not available; cannot resize images")
    img = Image.fromarray(arr)
    return np.asarray(img.resize((size, size), getattr(Image, resample)))


def _load_resize(path: str, dataset: str, mask: bool) -> np.ndarray:
    if Image is None:
        raise RuntimeError("PIL not available; cannot decode raw images")
    img = Image.open(path)
    resample = RESAMPLE[dataset]["mask" if mask else "image"]
    img = img.resize((SIZE, SIZE), getattr(Image, resample))
    return np.asarray(img)


def _find_mask(masks_dir: str, stem: str) -> str | None:
    for mext in EXTS:
        cand = os.path.join(masks_dir, stem + mext)
        if os.path.exists(cand):
            return cand
    return None


def _save_pair(out: str, sample_id: str, img: np.ndarray,
               mask: np.ndarray) -> None:
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    if mask.ndim == 3:
        mask = mask[..., 0]
    mask = (mask > 127).astype(np.uint8) if mask.max() > 1 else \
        (mask > 0).astype(np.uint8)
    np.save(os.path.join(out, "Image", f"{sample_id}.npy"),
            img[..., :3].astype(np.uint8))
    np.save(os.path.join(out, "Label", f"{sample_id}.npy"), mask)


def _write_meta(out: str, dataset: str, rows: list[dict]) -> None:
    df = pd.DataFrame(rows)
    if "diagnosis_id" not in df.columns and len(df):
        df["diagnosis_id"] = df["diagnosis"].astype("category").cat.codes
    df.to_csv(os.path.join(out, f"meta_{dataset}.csv"), index=False)
    print(f"{dataset}: wrote {len(df)} samples to {out}")


def process_isic2018(images_dir: str, masks_dir: str, out_root: str) -> None:
    out = os.path.join(out_root, "isic2018")
    os.makedirs(os.path.join(out, "Image"), exist_ok=True)
    os.makedirs(os.path.join(out, "Label"), exist_ok=True)
    subset = load_isic_subset()
    rows = []
    missing = 0
    for row in subset.itertuples():
        num_id = str(row.ID)
        img_path = os.path.join(images_dir, f"ISIC_{num_id}.jpg")
        mask_path = os.path.join(masks_dir, f"ISIC_{num_id}_segmentation.png")
        if not (os.path.exists(img_path) and os.path.exists(mask_path)):
            missing += 1
            continue
        img = _load_resize(img_path, "isic2018", mask=False)
        mask = _load_resize(mask_path, "isic2018", mask=True)
        _save_pair(out, num_id, img, mask)
        rows.append({"ID": num_id, "diagnosis": row.diagnosis,
                     "diagnosis_id": int(row.diagnosis_id),
                     "dataset": "isic2018"})
    if missing:
        print(f"isic2018: {missing} subset ids missing from raw folder")
    _write_meta(out, "isic2018", rows)


def _ph2_diagnosis(meta_path: str | None) -> dict[str, str]:
    """Image Name → diagnosis from the PH2 xlsx (first X among the three
    diagnosis columns, create_meta.ipynb cell 6)."""
    if meta_path is None:
        return {}
    df = pd.read_excel(meta_path, skiprows=range(12))
    out = {}
    for i in range(len(df)):
        row = df.iloc[i]
        for diag in ["Common Nevus", "Atypical Nevus", "Melanoma"]:
            if row.get(diag) == "X":
                out[str(row["Image Name"])] = diag
                break
    return out


def process_ph2(images_dir: str, masks_dir: str, out_root: str,
                meta_path: str | None) -> None:
    out = os.path.join(out_root, "PH2")
    os.makedirs(os.path.join(out, "Image"), exist_ok=True)
    os.makedirs(os.path.join(out, "Label"), exist_ok=True)
    diag = _ph2_diagnosis(meta_path)
    rows = []
    for fn in sorted(os.listdir(images_dir)):
        stem, ext = os.path.splitext(fn)
        if ext.lower() not in EXTS:
            continue
        mask_path = _find_mask(masks_dir, stem + "_lesion")
        if mask_path is None:
            print(f"skip {stem}: no mask")
            continue
        img = _load_resize(os.path.join(images_dir, fn), "PH2", mask=False)
        mask = _load_resize(mask_path, "PH2", mask=True)
        _save_pair(out, stem, img, mask)
        rows.append({"ID": stem, "diagnosis": diag.get(stem, "unknown"),
                     "dataset": "PH2"})
    _write_meta(out, "PH2", rows)


def process_dmf(images_dir: str, out_root: str,
                meta_path: str | None) -> None:
    out = os.path.join(out_root, "DMF")
    os.makedirs(os.path.join(out, "Image"), exist_ok=True)
    os.makedirs(os.path.join(out, "Label"), exist_ok=True)
    diag = {}
    if meta_path is not None:
        mdf = pd.read_csv(meta_path)
        for i in range(len(mdf)):
            # path like 'images/<id>/...' → id; dx.title()
            # (create_meta.ipynb cell 11)
            diag[mdf.iloc[i]["path"].split("/")[1]] = \
                str(mdf.iloc[i]["dx"]).title()
    rows = []
    for sample in sorted(os.listdir(images_dir)):
        d = os.path.join(images_dir, sample)
        img_path = os.path.join(d, sample + ".png")
        mask_path = os.path.join(d, sample + "mask.png")
        if not (os.path.isdir(d) and os.path.exists(img_path)
                and os.path.exists(mask_path)):
            continue
        img = _load_resize(img_path, "DMF", mask=False)
        mask = _load_resize(mask_path, "DMF", mask=True)
        _save_pair(out, sample, img, mask)
        rows.append({"ID": sample, "diagnosis": diag.get(sample, "unknown"),
                     "dataset": "DMF"})
    _write_meta(out, "DMF", rows)


def process_skd(images_root: str, out_root: str) -> None:
    out = os.path.join(out_root, "SKD")
    os.makedirs(os.path.join(out, "Image"), exist_ok=True)
    os.makedirs(os.path.join(out, "Label"), exist_ok=True)
    layouts = [
        ("skin_image_data_set-1/Skin Image Data Set-1/skin_data/melanoma",
         "Melanoma"),
        ("skin_image_data_set-2/Skin Image Data Set-2/skin_data/notmelanoma",
         "Benign"),
    ]
    rows = []
    for rel, diagnosis in layouts:
        base = os.path.join(images_root, rel)
        if not os.path.isdir(base):
            # tolerate a flattened layout: <root>/{melanoma,notmelanoma}
            alt = os.path.join(images_root, rel.split("/")[-1])
            if not os.path.isdir(alt):
                print(f"SKD: missing {base}")
                continue
            base = alt
        for subset in ["dermis", "dermquest"]:
            folder = os.path.join(base, subset)
            if not os.path.isdir(folder):
                continue
            for fn in sorted(os.listdir(folder)):
                if not fn.endswith(".jpg"):
                    continue
                stem = fn[:-4]
                # mask: '<stem[:-4]>contour.png' (process_resize.py:107)
                mask_path = os.path.join(folder, stem[:-4] + "contour.png")
                if not os.path.exists(mask_path):
                    continue
                sample_id = f"{subset}_{stem}"
                img = _load_resize(os.path.join(folder, fn), "SKD",
                                   mask=False)
                mask = _load_resize(mask_path, "SKD", mask=True)
                _save_pair(out, sample_id, img, mask)
                rows.append({"ID": sample_id, "diagnosis": diagnosis,
                             "dataset": "SKD"})
    _write_meta(out, "SKD", rows)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True,
                   choices=["isic2018", "PH2", "DMF", "SKD"])
    p.add_argument("--images", required=True,
                   help="images dir (SKD: dataset root; DMF: images/ root)")
    p.add_argument("--masks", default=None,
                   help="masks dir (isic2018/PH2 only)")
    p.add_argument("--meta", default=None,
                   help="raw metadata (PH2 xlsx / DMF meta.csv)")
    p.add_argument("--out", default="./data/skin_lesion")
    args = p.parse_args()
    if args.dataset == "isic2018":
        process_isic2018(args.images, args.masks or args.images, args.out)
    elif args.dataset == "PH2":
        process_ph2(args.images, args.masks or args.images, args.out,
                    args.meta)
    elif args.dataset == "DMF":
        process_dmf(args.images, args.out, args.meta)
    else:
        process_skd(args.images, args.out)


if __name__ == "__main__":
    main()
