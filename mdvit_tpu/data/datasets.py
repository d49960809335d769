"""Datasets: npy/csv layout, seeded splits, k-fold, synthetic generator.

Disk-layout parity with the reference (``Datasets/create_dataset.py``):
``<data_folder>/<dataset>/meta_<dataset>.csv`` (columns incl. ID, diagnosis,
diagnosis_id) plus ``Image/<ID>.npy`` and ``Label/<ID>.npy`` at 512².
Split files ``train/test_meta_kfold_{k}.csv`` (or ``train_meta_80.csv``…)
are created with the same ``random.Random(42).shuffle`` recipe
(``create_dataset.py:61-70,100-111``) so folds match the reference exactly.

TPU-native difference: instead of per-item CPU DataLoader workers, each
dataset is loaded ONCE, resized to the training resolution (bilinear image /
nearest mask — albumentations ``A.Resize`` semantics), and handed to the
loader as a dense uint8 array that lives in device HBM. All subsequent
augmentation happens on device (data/augment.py).
"""
from __future__ import annotations

import os
import random
from dataclasses import dataclass, field
from typing import Sequence

import numpy as np
import pandas as pd

dataset_indices = {
    "isic2018": 0,
    "PH2": 1,
    "DMF": 2,
    "SKD": 3,
}

# train-split sizes in the default 4-domain recipe (multi_train_MDViT.py:470)
REFERENCE_DOMAIN_SIZES = {"isic2018": 2594, "PH2": 200, "DMF": 1212, "SKD": 206}


def _resize_bilinear_np(img: np.ndarray, size: int) -> np.ndarray:
    """Half-pixel bilinear resize (cv2.INTER_LINEAR / torch parity), numpy."""
    h, w = img.shape[0], img.shape[1]
    if h == size and w == size:
        return img
    out = np.empty((size, size) + img.shape[2:], np.float32)
    scale_y, scale_x = h / size, w / size
    ys = (np.arange(size) + 0.5) * scale_y - 0.5
    xs = (np.arange(size) + 0.5) * scale_x - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(ys - np.floor(ys), 0, 1)[:, None]
    fx = np.clip(xs - np.floor(xs), 0, 1)[None, :]
    if img.ndim == 3:
        fy = fy[..., None]
        fx = fx[..., None]
    imgf = img.astype(np.float32)
    top = imgf[y0][:, x0] * (1 - fx) + imgf[y0][:, x1] * fx
    bot = imgf[y1][:, x0] * (1 - fx) + imgf[y1][:, x1] * fx
    out[:] = top * (1 - fy) + bot * fy
    return out


def _resize_nearest_np(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[0], img.shape[1]
    if h == size and w == size:
        return img
    # cv2.INTER_NEAREST: src index = floor(dst * scale)
    ys = np.minimum((np.arange(size) * (h / size)).astype(np.int64), h - 1)
    xs = np.minimum((np.arange(size) * (w / size)).astype(np.int64), w - 1)
    return img[ys][:, xs]


@dataclass
class DomainArrays:
    """One split of one domain as dense arrays (host-side; the loader moves
    them to device)."""

    name: str
    domain_id: int
    images: np.ndarray  # (N, S, S, 3) uint8
    masks: np.ndarray  # (N, S, S) uint8 {0,1}
    ids: list = field(default_factory=list)

    def __len__(self) -> int:
        return self.images.shape[0]


def write_kfold_splits(data_path: str, dataset_name: str) -> None:
    """Create the 5 seeded fold csvs exactly as the reference does
    (``create_dataset.py:57-70``)."""
    df = pd.read_csv(
        os.path.join(data_path, f"meta_{dataset_name}.csv"), dtype={"ID": str}
    )
    n = len(df)
    index_list = list(range(n))
    random.Random(42).shuffle(index_list)
    split_size = int(n / 5.0 + 0.5)
    split_ids = [0, split_size, split_size * 2, split_size * 3, split_size * 4, n]
    for i in range(5):
        train_df = df.iloc[index_list[: split_ids[i]] + index_list[split_ids[i + 1]:]]
        test_df = df.iloc[index_list[split_ids[i]: split_ids[i + 1]]]
        train_df.to_csv(
            os.path.join(data_path, f"train_meta_kfold_{i}.csv"), index=False
        )
        test_df.to_csv(
            os.path.join(data_path, f"test_meta_kfold_{i}.csv"), index=False
        )


def write_ratio_splits(
    data_path: str, dataset_name: str, split_ratio=(0.8, 0.2)
) -> None:
    """80/20 split csvs (``create_dataset.py:96-111``)."""
    df = pd.read_csv(
        os.path.join(data_path, f"meta_{dataset_name}.csv"), dtype={"ID": str}
    )
    n = len(df)
    index_list = list(range(n))
    random.Random(42).shuffle(index_list)
    cut = int(n * split_ratio[0])
    df.iloc[index_list[:cut]].to_csv(
        os.path.join(data_path, f"train_meta_{int(split_ratio[0] * 100)}.csv"),
        index=False,
    )
    df.iloc[index_list[cut:]].to_csv(
        os.path.join(data_path, f"test_meta_{int(split_ratio[1] * 100)}.csv"),
        index=False,
    )


def _load_split_df(
    data_path: str, dataset_name: str, k_fold: str, split_ratio, split: str
) -> pd.DataFrame:
    if k_fold != "No":
        path = os.path.join(data_path, f"{split}_meta_kfold_{k_fold}.csv")
        if not os.path.exists(path):
            write_kfold_splits(data_path, dataset_name)
        return pd.read_csv(path, dtype={"ID": str})
    pct = int(split_ratio[0] * 100) if split == "train" else int(split_ratio[1] * 100)
    path = os.path.join(data_path, f"{split}_meta_{pct}.csv")
    if not os.path.exists(path):
        write_ratio_splits(data_path, dataset_name, split_ratio)
    return pd.read_csv(path, dtype={"ID": str})


def load_domain_arrays(
    data_folder: str,
    dataset_name: str,
    img_size: int,
    k_fold: str = "4",
    split_ratio=(0.8, 0.2),
) -> dict[str, DomainArrays]:
    """Load train+test splits of one domain as dense uint8 arrays at
    ``img_size`` (the reference resizes per item in the loader; we resize once
    at load)."""
    data_path = os.path.join(data_folder, dataset_name)
    out = {}
    for split in ("train", "test"):
        df = _load_split_df(data_path, dataset_name, k_fold, split_ratio, split)
        n = len(df)
        images = np.empty((n, img_size, img_size, 3), np.uint8)
        masks = np.empty((n, img_size, img_size), np.uint8)
        ids = [str(row.ID) for row in df.itertuples()]
        img_paths = [os.path.join(data_path, "Image", f"{s}.npy") for s in ids]
        lbl_paths = [os.path.join(data_path, "Label", f"{s}.npy") for s in ids]

        # fast path: whole-split load through the C++ threaded npy reader
        # (csrc/npy_loader.cpp) when the corpus is uniform uint8
        raw_imgs = raw_lbls = None
        if n > 0:
            probe = np.load(img_paths[0])
            if probe.dtype == np.uint8:
                from mdvit_tpu.data.native_loader import batch_load_u8

                raw_imgs = batch_load_u8(img_paths, probe.shape)
                probe_l = np.load(lbl_paths[0])
                if probe_l.dtype == np.uint8:
                    raw_lbls = batch_load_u8(lbl_paths, probe_l.shape)

        for i in range(n):
            img = raw_imgs[i] if raw_imgs is not None else np.load(img_paths[i])
            lbl = raw_lbls[i] if raw_lbls is not None else np.load(lbl_paths[i])
            lbl = (lbl > 0.5).astype(np.uint8)
            # resize in the source dtype: float-stored corpora go through
            # the bilinear resize at full precision (reference keeps floats
            # through A.Resize, create_dataset.py:132), uint8 only after clip
            img = np.clip(
                _resize_bilinear_np(img.astype(np.float32), img_size), 0, 255
            ).astype(np.uint8)
            lbl = _resize_nearest_np(lbl, img_size)
            images[i] = img
            masks[i] = lbl
        out[split] = DomainArrays(
            name=dataset_name,
            domain_id=dataset_indices.get(dataset_name, 0),
            images=images,
            masks=masks,
            ids=ids,
        )
    return out


def synthetic_domain_arrays(
    dataset_name: str,
    img_size: int,
    n_train: int,
    n_test: int,
    seed: int | None = None,
) -> dict[str, DomainArrays]:
    """Deterministic synthetic skin-lesion-like data (ellipse blobs on noise)
    for tests and benchmarks where the real npy corpus is absent."""
    domain_id = dataset_indices.get(dataset_name, 0)
    rng = np.random.RandomState(
        seed if seed is not None else 1000 + domain_id
    )
    out = {}
    for split, n in (("train", n_train), ("test", n_test)):
        images = np.empty((n, img_size, img_size, 3), np.uint8)
        masks = np.empty((n, img_size, img_size), np.uint8)
        yy, xx = np.mgrid[0:img_size, 0:img_size]
        for i in range(n):
            cy, cx = rng.uniform(0.3, 0.7, 2) * img_size
            ry, rx = rng.uniform(0.1, 0.3, 2) * img_size
            theta = rng.uniform(0, np.pi)
            ys, xs = yy - cy, xx - cx
            yr = ys * np.cos(theta) - xs * np.sin(theta)
            xr = ys * np.sin(theta) + xs * np.cos(theta)
            mask = ((yr / ry) ** 2 + (xr / rx) ** 2 <= 1.0).astype(np.uint8)
            base = rng.uniform(120, 200)
            img = rng.normal(base, 15, (img_size, img_size, 3))
            lesion = rng.uniform(40, 110, 3)
            img = np.where(mask[..., None] > 0, lesion + 10 * rng.randn(), img)
            images[i] = np.clip(img, 0, 255).astype(np.uint8)
            masks[i] = mask
        out[split] = DomainArrays(
            name=dataset_name, domain_id=domain_id, images=images,
            masks=masks, ids=[f"{dataset_name}_{split}_{i}" for i in range(n)],
        )
    return out


def build_domain_data(
    names: Sequence[str],
    data_folder: str,
    img_size: int,
    k_fold: str = "4",
    split_ratio=(0.8, 0.2),
    synthetic: bool = False,
    synthetic_sizes: dict | None = None,
) -> dict[str, dict[str, DomainArrays]]:
    """{dataset_name: {'train': DomainArrays, 'test': DomainArrays}}"""
    result = {}
    for name in names:
        if synthetic:
            sizes = (synthetic_sizes or {}).get(name, (24, 8))
            result[name] = synthetic_domain_arrays(
                name, img_size, sizes[0], sizes[1]
            )
        else:
            result[name] = load_domain_arrays(
                data_folder, name, img_size, k_fold, split_ratio
            )
    return result
