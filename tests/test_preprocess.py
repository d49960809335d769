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
