"""End-to-end test of ``scripts/extract_features.py`` — the classification/
feature half of the data path (reference ``create_dataset.py:195-248``
SkinClasDataset + ``mdvit.py:682-684`` ``out_seg=False`` pooled features):
runs the real CLI on a synthetic corpus and on an on-disk npy corpus with a
meta csv, asserting npz contents (features/diagnosis_id/domain_id/ids)."""
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

TINY_KWARGS = (
    '{"num_layers": [1, 1, 1, 1], "embed_dims": [8, 8, 8, 8], '
    '"mlp_ratios": [1, 1, 1, 1], "num_heads": [8, 8, 8, 8]}'
)


def _run(args, repo):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "scripts/extract_features.py", *args],
        capture_output=True, text=True, env=env, cwd=repo, timeout=1500,
    )


@pytest.mark.slow
def test_extract_features_synthetic(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "feat"
    proc = _run(
        ["--synthetic", "--img_size", "16", "--batch_size", "4",
         "--dataset", "isic2018", "PH2", "--out", str(out),
         "--model_kwargs", TINY_KWARGS], repo)
    assert proc.returncode == 0, proc.stderr[-3000:]
    for name in ("isic2018", "PH2"):
        z = np.load(out / f"features_{name}.npz", allow_pickle=True)
        n = 24  # synthetic default train size
        assert z["features"].shape == (n, 8)  # pooled stage-4 dim
        assert np.isfinite(z["features"]).all()
        assert z["diagnosis_id"].shape == (n,)
        assert z["domain_id"].shape == (n,)
        assert len(z["ids"]) == n
    # features must separate the two synthetic domains at least trivially
    za = np.load(out / "features_isic2018.npz")["features"]
    zb = np.load(out / "features_PH2.npz")["features"]
    assert not np.allclose(za.mean(0), zb.mean(0))


@pytest.mark.slow
def test_extract_features_reads_diagnosis_from_meta_csv(tmp_path):
    """npy-corpus path: diagnosis ids come from ``meta_<name>.csv`` joined on
    the split's sample IDs."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    name = "PH2"
    droot = tmp_path / "data" / name
    (droot / "Image").mkdir(parents=True)
    (droot / "Label").mkdir()
    rng = np.random.RandomState(0)
    ids, diags = [], []
    for i in range(6):
        sid = f"IMD{i:03d}"
        ids.append(sid)
        diags.append(i % 3)
        np.save(droot / "Image" / f"{sid}.npy",
                rng.randint(0, 255, (20, 20, 3), np.uint8))
        np.save(droot / "Label" / f"{sid}.npy",
                (rng.rand(20, 20) > 0.5).astype(np.uint8))
    pd.DataFrame({"ID": ids, "diagnosis": ["d"] * 6,
                  "diagnosis_id": diags}).to_csv(
        droot / f"meta_{name}.csv", index=False)

    out = tmp_path / "feat"
    proc = _run(
        ["--img_size", "16", "--batch_size", "4", "--dataset", name,
         "--data_folder", str(tmp_path / "data"), "--out", str(out),
         "--model_kwargs", TINY_KWARGS], repo)
    assert proc.returncode == 0, proc.stderr[-3000:]
    z = np.load(out / f"features_{name}.npz", allow_pickle=True)
    got_ids = [str(s) for s in z["ids"]]
    assert 0 < len(got_ids) <= 6  # the k-fold train split of the 6 samples
    lut = dict(zip(ids, diags))
    np.testing.assert_array_equal(
        z["diagnosis_id"], [lut[s] for s in got_ids])
    assert z["features"].shape == (len(got_ids), 8)
