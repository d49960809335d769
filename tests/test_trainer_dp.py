"""Production CLI data-parallelism: the Trainer itself must build the mesh
and shard the train/eval steps when >1 device is visible (reference
DataParallel auto-engagement, ``multi_train_MDViT.py:73-74``) — round 2 left
``tpu.mesh`` a dead config key and train.py single-device on any topology.

Runs the REAL Trainer (synthetic data, tiny model via ``model_kwargs``) on
the 8-virtual-device CPU mesh from conftest.
"""
import jax
import numpy as np
import pytest

from mdvit_tpu.config import load_config
from mdvit_tpu.train.trainer import Trainer

TINY_MODEL = {
    "num_layers": [1, 1, 1, 1],
    "embed_dims": [8, 8, 8, 8],
    "mlp_ratios": [1, 1, 1, 1],
    "num_heads": [8, 8, 8, 8],
}


def _config(tmp_path, batch_size=2, mesh_data=-1):
    return load_config(overrides={
        "debug": True,
        "data": {"img_size": 16, "synthetic": True,
                 "synthetic_sizes": {"isic2018": [6, 3], "PH2": [6, 3],
                                     "DMF": [6, 3], "SKD": [6, 3]}},
        "train": {"num_epochs": 1, "batch_size": batch_size},
        "test": {"batch_size": 5},
        "model_kwargs": TINY_MODEL,
        "tpu": {"compute_dtype": "float32", "mesh": {"data": mesh_data}},
    })


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device CPU mesh")
def test_trainer_builds_mesh_and_shards(tmp_path):
    cfg = _config(tmp_path)  # D·B = 8 divides the 8-device mesh
    tr = Trainer(cfg, str(tmp_path / "exp"))
    # the wiring: mesh over all devices, non-trivial batch sharding spec,
    # replicated device store
    assert tr.mesh is not None and tr.mesh.devices.size == 8
    assert tr.data_sharding is not None
    assert tuple(tr.data_sharding.spec) == ("data",)
    for arr in tr.store.images + tr.store.masks:
        assert len(arr.sharding.device_set) == 8

    # a real sharded train epoch through the production path
    tr.train_epoch(0)
    assert int(tr.state.step) == 1
    # the updated state is laid out across the whole mesh (replicated), not
    # resident on a single device — proof the step executed under the mesh
    leaf = jax.tree_util.tree_leaves(tr.state.params)[0]
    assert len(leaf.sharding.device_set) == 8

    # sharded eval through the production path (3 test samples, nominal
    # batch 5, every batch padded up to the mesh multiple 8)
    res = tr.evaluate("test")
    for n in tr.names:
        assert np.isfinite(res[n]["loss"])
        assert 0.0 <= res[n]["dice"] <= 1.0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device CPU mesh")
def test_trainer_single_device_when_mesh_capped(tmp_path):
    """tpu.mesh.data=1 must keep the exact single-device behaviour."""
    cfg = _config(tmp_path, mesh_data=1)
    tr = Trainer(cfg, str(tmp_path / "exp1"))
    assert tr.mesh is None and tr.data_sharding is None
    tr.train_epoch(0)
    assert int(tr.state.step) == 1


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device CPU mesh")
def test_trainer_mesh_shrinks_to_batch_divisor(tmp_path):
    """global batch 4·3=12 on 8 devices → largest divisor ≤ 8 is 6."""
    cfg = _config(tmp_path, batch_size=3)
    tr = Trainer(cfg, str(tmp_path / "exp2"))
    assert tr.mesh is not None and tr.mesh.devices.size == 6


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device CPU mesh")
def test_evaluate_metric_protocol_mesh_invariant(tmp_path):
    """``evaluate()`` must report the SAME numbers on 1 device and on the
    8-device mesh for a ``test.batch_size`` (5) that divides neither the test
    split (7) nor the mesh: Dice/IoU are medpy-global per eval batch then
    batch-weighted (reference ``multi_train_MDViT.py:273-291``), so the batch
    grouping is part of the metric protocol — the DP path pads each nominal
    batch up to a mesh multiple instead of regrouping at a larger batch."""
    sizes = {"isic2018": [6, 7], "PH2": [6, 7], "DMF": [6, 7], "SKD": [6, 7]}

    def cfg(mesh_data):
        return load_config(overrides={
            "debug": True,
            "data": {"img_size": 16, "synthetic": True,
                     "synthetic_sizes": sizes},
            "train": {"num_epochs": 1, "batch_size": 2},
            "test": {"batch_size": 5},
            "model_kwargs": TINY_MODEL,
            "tpu": {"compute_dtype": "float32",
                    "mesh": {"data": mesh_data}},
        })

    tr1 = Trainer(cfg(1), str(tmp_path / "exp_1dev"))
    tr8 = Trainer(cfg(-1), str(tmp_path / "exp_8dev"))
    assert tr1.mesh is None and tr8.mesh is not None
    # identical seeded init → identical weights; only the mesh differs
    res1 = tr1.evaluate("test")
    res8 = tr8.evaluate("test")
    for n in tr1.names:
        for key in ("loss", "dice", "iou", "aux_dice", "aux_iou"):
            np.testing.assert_allclose(
                res1[n][key], res8[n][key], rtol=1e-5, atol=1e-6,
                err_msg=f"{n}/{key} differs between 1-device and mesh eval")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device CPU mesh")
def test_device_eval_matches_streaming(tmp_path):
    """The device-resident eval path (HBM uint8 split store + index-only
    H2D, ``tpu.device_eval=True``, the default) must report exactly what the
    host-streaming path reports: the inside-jit gather pads the ragged tail
    with a REAL row (index ``offset``) instead of zeros, which is metric-
    irrelevant because the eval step masks every reduction by ``valid``.
    Covers full batches AND a padded tail (test split 7, batch 5)."""
    sizes = {"isic2018": [6, 7], "PH2": [6, 7], "DMF": [6, 7], "SKD": [6, 7]}

    def cfg(device_eval):
        return load_config(overrides={
            "data": {"img_size": 16, "synthetic": True,
                     "synthetic_sizes": sizes},
            "train": {"num_epochs": 1, "batch_size": 2},
            "test": {"batch_size": 5},
            "model_kwargs": TINY_MODEL,
            "tpu": {"compute_dtype": "float32", "mesh": {"data": 1},
                    "device_eval": device_eval},
        })

    tr_dev = Trainer(cfg(True), str(tmp_path / "exp_dev"))
    tr_str = Trainer(cfg(False), str(tmp_path / "exp_str"))
    assert tr_dev.device_eval and not tr_str.device_eval
    res_dev = tr_dev.evaluate("test")
    res_str = tr_str.evaluate("test")
    # the split store was built lazily, once, and covers all domains
    store = tr_dev._eval_stores["test"]
    assert store.images.dtype == np.uint8 and store.images.shape[0] == 4 * 7
    for n in tr_dev.names:
        for key in ("loss", "dice", "iou", "aux_dice", "aux_iou"):
            np.testing.assert_allclose(
                res_dev[n][key], res_str[n][key], rtol=1e-6, atol=1e-7,
                err_msg=f"{n}/{key}: device-resident eval != streaming eval")
