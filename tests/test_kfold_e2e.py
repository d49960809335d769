"""End-to-end k-fold micro-run: two tiny synthetic folds driven through the
REAL CLI (``train.py`` subprocess, debug mode) then aggregated by
``scripts/kfold_aggregate.py``, pinning the ``k_fold.csv`` schema against
``Evaluation/k_fold_val.ipynb`` cells 2-5 (``<col>_m``/``<col>_s`` columns,
population std, per-dataset + Total rows).
"""
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest
import yaml

from scripts.kfold_aggregate import aggregate

TINY_YML = {
    "debug": True,
    "data": {"img_size": 16, "synthetic": True,
             "name": ["isic2018", "PH2"],
             "synthetic_sizes": {"isic2018": [6, 4], "PH2": [6, 4]}},
    "train": {"num_epochs": 1, "batch_size": 2},
    "test": {"batch_size": 4},
    "model_kwargs": {"num_layers": [1, 1, 1, 1], "embed_dims": [8, 8, 8, 8],
                     "mlp_ratios": [1, 1, 1, 1], "num_heads": [8, 8, 8, 8]},
    # default mesh (-1): the subprocess inherits the 8-virtual-device CPU
    # platform, so the folds run the SHARDED train/eval/test path end-to-end
    "tpu": {"compute_dtype": "float32"},
}


@pytest.mark.slow
def test_kfold_micro_run_through_cli(tmp_path):
    cfg_path = tmp_path / "tiny.yml"
    cfg_path.write_text(yaml.safe_dump(TINY_YML))
    exp_dirs = []
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the subprocess CPU-only
    env["JAX_PLATFORMS"] = "cpu"
    for fold in ("0", "1"):
        exp_dir = str(tmp_path / f"fold{fold}")
        proc = subprocess.run(
            [sys.executable, "train.py", "--exp_name", f"kf{fold}",
             "--model", "MDViT", "--config_yml", str(cfg_path),
             "--k_fold", fold, "--exp_dir", exp_dir],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            timeout=1500,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        assert os.path.exists(os.path.join(exp_dir, "test_results.csv")), (
            proc.stdout[-2000:])
        exp_dirs.append(exp_dir)

    df = aggregate(exp_dirs)
    out = tmp_path / "k_fold.csv"
    df.to_csv(out, index=False)

    # notebook cell 5 schema
    assert list(df.columns) == [
        "Name", "loss_m", "loss_s", "Di_score_m", "Di_score_s",
        "IOU_m", "IOU_s",
    ]
    assert list(df["Name"]) == ["isic2018", "PH2", "Total"]

    # pin the math: mean + POPULATION std over folds, positionally stacked
    f0 = pd.read_csv(os.path.join(exp_dirs[0], "test_results.csv"))
    f1 = pd.read_csv(os.path.join(exp_dirs[1], "test_results.csv"))
    for col in ("loss", "Di_score", "IOU"):
        want_m = (f0[col].values + f1[col].values) / 2
        want_s = np.std(np.stack([f0[col].values, f1[col].values]), axis=0)
        np.testing.assert_allclose(df[f"{col}_m"].values.astype(float),
                                   want_m, rtol=1e-9)
        np.testing.assert_allclose(df[f"{col}_s"].values.astype(float),
                                   want_s, rtol=1e-9, atol=1e-12)
    assert np.isfinite(df["Di_score_m"].values.astype(float)).all()


def test_aggregate_aligns_rows_by_name(tmp_path):
    """Folds whose test_results.csv rows are ordered differently must be
    averaged per-dataset (keyed by Name), not positionally; folds with a
    different dataset set are refused."""
    a = tmp_path / "f0"
    b = tmp_path / "f1"
    a.mkdir(), b.mkdir()
    pd.DataFrame({"Name": ["isic2018", "PH2", "Total"],
                  "dice": [0.8, 0.6, 0.7]}).to_csv(
        a / "test_results.csv", index=False)
    pd.DataFrame({"Name": ["PH2", "isic2018", "Total"],
                  "dice": [0.4, 1.0, 0.7]}).to_csv(
        b / "test_results.csv", index=False)
    df = aggregate([str(a), str(b)]).set_index("Name")
    np.testing.assert_allclose(df.loc["isic2018", "dice_m"], 0.9)
    np.testing.assert_allclose(df.loc["PH2", "dice_m"], 0.5)

    pd.DataFrame({"Name": ["DMF", "Total"], "dice": [0.5, 0.5]}).to_csv(
        b / "test_results.csv", index=False)
    with pytest.raises(SystemExit, match="do not match"):
        aggregate([str(a), str(b)])
