"""End-to-end inference CLI test: train a tiny synthetic MDViT through the
real ``train.py`` CLI, then segment fresh images with ``scripts/predict.py``
(the serving path the reference lacks — its only inference surface is
``test.only_test``, ``multi_train_MDViT.py:79-80``)."""
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

TINY_YML = {
    "debug": True,
    "data": {"img_size": 16, "synthetic": True,
             "name": ["isic2018", "PH2"],
             "synthetic_sizes": {"isic2018": [6, 4], "PH2": [6, 4]}},
    "train": {"num_epochs": 1, "batch_size": 2},
    "test": {"batch_size": 4},
    "model_kwargs": {"num_layers": [1, 1, 1, 1], "embed_dims": [8, 8, 8, 8],
                     "mlp_ratios": [1, 1, 1, 1], "num_heads": [8, 8, 8, 8]},
    "tpu": {"compute_dtype": "float32"},
}


@pytest.mark.slow
def test_predict_cli_end_to_end(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"

    cfg_path = tmp_path / "tiny.yml"
    cfg_path.write_text(yaml.safe_dump(TINY_YML))
    exp_dir = str(tmp_path / "exp")
    proc = subprocess.run(
        [sys.executable, "train.py", "--exp_name", "pred", "--model",
         "MDViT", "--config_yml", str(cfg_path), "--exp_dir", exp_dir],
        capture_output=True, text=True, env=env, cwd=repo, timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    # fresh inputs: one 512²-style npy (bigger than img_size → resize path)
    # and one non-square one
    rng = np.random.RandomState(0)
    in_dir = tmp_path / "inputs"
    in_dir.mkdir()
    np.save(in_dir / "a.npy", rng.randint(0, 255, (32, 32, 3), np.uint8))
    np.save(in_dir / "b.npy", rng.rand(24, 20, 3).astype(np.float32))

    out_dir = tmp_path / "preds"
    proc = subprocess.run(
        [sys.executable, "scripts/predict.py", "--ckpt_dir", exp_dir,
         "--inputs", str(in_dir), "--out_dir", str(out_dir),
         "--domain", "1", "--batch_size", "2", "--save_prob"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    for stem in ("a", "b"):
        mask_png = out_dir / f"{stem}_mask.png"
        mask_npy = out_dir / f"{stem}_mask.npy"
        assert mask_png.exists() or mask_npy.exists()
        if mask_png.exists():
            from PIL import Image

            mask = np.asarray(Image.open(mask_png))
        else:
            mask = np.load(mask_npy)
        assert mask.shape == (16, 16)
        assert set(np.unique(mask)).issubset({0, 255, 1})
        prob = np.load(out_dir / f"{stem}_prob.npy")
        assert prob.shape == (16, 16)
        assert np.all((prob >= 0) & (prob <= 1))

    # StableHLO serving export from the same checkpoint, self-checked
    blob = tmp_path / "model.stablehlo"
    proc = subprocess.run(
        [sys.executable, "scripts/export_model.py", "--ckpt_dir", exp_dir,
         "--out", str(blob), "--batch_size", "2", "--check"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "check ok" in proc.stdout, proc.stdout[-2000:]
    assert blob.stat().st_size > 0
