"""Offline preprocessing: ISIC2018 corpus definition + per-dataset layouts.

The reference trains on a pinned 2,594-image ISIC2018 subset
(``Datasets/isic2018_id.csv``) with real diagnosis metadata
(``Datasets/create_meta.ipynb``); these tests pin the vendored derivation and
the subset filtering.
"""
import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
import preprocess  # noqa: E402

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def test_isic_subset_table():
    df = preprocess.load_isic_subset()
    assert len(df) == 2594
    assert df["ID"].is_unique
    # notebook transform: ID = numeric part of ISIC_xxxxxxx
    assert all(s.isdigit() and len(s) == 7 for s in df["ID"])
    assert set(df["diagnosis"]) == {
        "Nevus", "Melanoma", "Seborrheic_keratosis"}
    # diagnosis_id = category codes over the capitalized Class
    cats = df["diagnosis"].astype("category").cat.codes
    assert (df["diagnosis_id"] == cats).all()


def _write_png(path, arr):
    Image.fromarray(arr).save(path)


def test_isic_preprocess_filters_to_subset(tmp_path):
    """Files not in the 2,594-id subset must be excluded; meta carries the
    real diagnosis."""
    subset = preprocess.load_isic_subset()
    in_id = str(subset.iloc[0]["ID"])
    img_dir = tmp_path / "raw_img"
    mask_dir = tmp_path / "raw_mask"
    img_dir.mkdir()
    mask_dir.mkdir()
    rng = np.random.RandomState(0)
    for num_id in [in_id, "9999999"]:  # second id is NOT in the subset
        rgb = rng.randint(0, 255, (64, 48, 3), dtype=np.uint8)
        m = (rng.rand(64, 48) > 0.5).astype(np.uint8) * 255
        Image.fromarray(rgb).save(img_dir / f"ISIC_{num_id}.jpg")
        _write_png(mask_dir / f"ISIC_{num_id}_segmentation.png", m)

    preprocess.process_isic2018(str(img_dir), str(mask_dir), str(tmp_path))
    out = tmp_path / "isic2018"
    meta = pd.read_csv(out / "meta_isic2018.csv", dtype={"ID": str})
    assert list(meta["ID"]) == [in_id]
    assert meta.iloc[0]["diagnosis"] == subset.iloc[0]["diagnosis"]
    assert int(meta.iloc[0]["diagnosis_id"]) == \
        int(subset.iloc[0]["diagnosis_id"])
    img = np.load(out / "Image" / f"{in_id}.npy")
    lbl = np.load(out / "Label" / f"{in_id}.npy")
    assert img.shape == (512, 512, 3) and img.dtype == np.uint8
    assert lbl.shape == (512, 512) and set(np.unique(lbl)) <= {0, 1}


def test_skd_layout_and_diagnosis(tmp_path):
    """SKD: nested melanoma/notmelanoma × dermis/dermquest walk, contour
    masks, ids prefixed by subset (process_resize.py:97-110)."""
    rng = np.random.RandomState(1)
    base1 = (tmp_path / "skin_image_data_set-1" / "Skin Image Data Set-1"
             / "skin_data" / "melanoma" / "dermis")
    base2 = (tmp_path / "skin_image_data_set-2" / "Skin Image Data Set-2"
             / "skin_data" / "notmelanoma" / "dermquest")
    for base, stem in [(base1, "abc_orig"), (base2, "xyz_orig")]:
        base.mkdir(parents=True)
        rgb = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(rgb).save(base / f"{stem}.jpg")
        m = (rng.rand(32, 32) > 0.5).astype(np.uint8) * 255
        _write_png(base / f"{stem[:-4]}contour.png", m)

    preprocess.process_skd(str(tmp_path), str(tmp_path / "out"))
    meta = pd.read_csv(tmp_path / "out" / "SKD" / "meta_SKD.csv")
    assert sorted(meta["ID"]) == ["dermis_abc_orig", "dermquest_xyz_orig"]
    diag = dict(zip(meta["ID"], meta["diagnosis"]))
    assert diag["dermis_abc_orig"] == "Melanoma"
    assert diag["dermquest_xyz_orig"] == "Benign"


def test_interpolation_kernel_choice_per_dataset():
    """Pin the per-dataset resize kernels to the reference's
    (process_resize.py: ISIC INTER_CUBIC img / INTER_NEAREST mask :45-46;
    PH2/SKD/DMF INTER_AREA for both :76-77,114-115,147-149)."""
    assert preprocess.RESAMPLE["isic2018"] == {"image": "BICUBIC",
                                               "mask": "NEAREST"}
    for ds in ("PH2", "DMF", "SKD"):
        assert preprocess.RESAMPLE[ds] == {"image": "BOX", "mask": "BOX"}


def test_box_resize_is_area_average():
    """PIL BOX downscale at an integer factor must equal the exact block
    mean (what cv2.INTER_AREA computes), pinned against a precomputed
    area-average array."""
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 255, (16, 16), dtype=np.uint8)
    got = preprocess.resize_array(arr, "BOX", size=4)
    want = arr.reshape(4, 4, 4, 4).mean(axis=(1, 3))
    # PIL accumulates in fixed point, so allow rounding to the neighbouring
    # uint8 value (<1 count); BICUBIC/NEAREST deviate by tens of counts here
    assert np.abs(got.astype(np.float64) - want).max() < 1.0
    nearest = preprocess.resize_array(arr, "NEAREST", size=4)
    assert np.abs(nearest.astype(np.float64) - want).max() > 5.0


def test_area_mask_binarization(tmp_path):
    """PH2-style masks go through area resize then the >0.5 threshold —
    matching the reference's INTER_AREA resize + create_dataset.py load-time
    binarization. A half-covered block must round by area fraction, which
    NEAREST would get wrong."""
    # 8×8 mask: left half 255 → 2×2 output: left column avg 255 (→1),
    # right column avg 0 (→0)
    m = np.zeros((8, 8), dtype=np.uint8)
    m[:, :4] = 255
    small = preprocess.resize_array(m, "BOX", size=2)
    assert (small[:, 0] > 127).all() and (small[:, 1] <= 127).all()
    # a 3/4-covered block area-averages above threshold, a 1/4 one below
    m2 = np.zeros((8, 8), dtype=np.uint8)
    m2[:3, :4] = 255   # 3 of 4 rows of the top-left 4×4 block
    m2[:1, 4:] = 255   # 1 of 4 rows of the top-right 4×4 block
    s2 = preprocess.resize_array(m2, "BOX", size=2)
    assert s2[0, 0] > 127 and s2[0, 1] <= 127


def test_dmf_layout_and_diagnosis(tmp_path):
    """DMF: nested <id>/<id>.png + <id>mask.png; diagnosis = dx.title() from
    meta.csv (create_meta.ipynb cell 11)."""
    rng = np.random.RandomState(2)
    images = tmp_path / "images"
    for sample in ["lesionA", "lesionB"]:
        d = images / sample
        d.mkdir(parents=True)
        rgb = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(rgb).save(d / f"{sample}.png")
        m = (rng.rand(32, 32) > 0.5).astype(np.uint8) * 255
        _write_png(d / f"{sample}mask.png", m)
    pd.DataFrame({
        "path": ["images/lesionA/x.png", "images/lesionB/y.png"],
        "dx": ["melanocytic nevus", "bcc"],
    }).to_csv(tmp_path / "meta.csv", index=False)

    preprocess.process_dmf(str(images), str(tmp_path / "out"),
                           str(tmp_path / "meta.csv"))
    meta = pd.read_csv(tmp_path / "out" / "DMF" / "meta_DMF.csv")
    diag = dict(zip(meta["ID"], meta["diagnosis"]))
    assert diag == {"lesionA": "Melanocytic Nevus", "lesionB": "Bcc"}
