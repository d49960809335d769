"""``config.pretrained_folder`` wiring: converted ImageNet backbone trees are
grafted into TransFuse init variables — the counterpart of the reference's
mandatory pretrained init (``TransFuse.py:86,189,293``) via the
partial-state-dict loader ``load_pretrain`` (``pieces.py:56-73``).
"""
import jax
import numpy as np
import torch
from flax.serialization import msgpack_serialize

from mdvit_tpu.models.transfuse import TransFuse
from mdvit_tpu.train.pretrained import (
    apply_pretrained,
    resize_grid_pos_embed,
)
from scripts.convert_torch_weights import convert_deit, convert_resnet
from tests.test_weight_converter import (
    BasicBlock,
    TorchDeiT,
    TorchResNet3Stages,
)

torch.manual_seed(7)

RNGS = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}


def _write_backbones(folder, grid=(2, 2)):
    """Random-weight resnet34 + deit_small trees in the converter's on-disk
    format (msgpack blobs named by --arch stem)."""
    tm = TorchResNet3Stages(BasicBlock).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    rp, rs = convert_resnet(sd, "resnet34")
    (folder / "resnet34.msgpack").write_bytes(
        msgpack_serialize({"params": rp, "batch_stats": rs}))

    td = TorchDeiT(embed_dim=384, depth=8, heads=6).eval()
    sd = {k: v.detach().numpy() for k, v in td.state_dict().items()}
    dp = convert_deit(sd, grid, depth=8)
    (folder / "deit_small.msgpack").write_bytes(
        msgpack_serialize({"params": dp,
                           "meta": {"arch": "deit_small",
                                    "grid": list(grid)}}))
    return rp, rs, dp


def _init_transfuse_s(img=32):
    m = TransFuse(img_size=img, variant="S", sup=False)
    x = np.zeros((1, img, img, 3), np.float32)
    return m, jax.jit(lambda: m.init(RNGS, x, None, train=False))()


def test_apply_pretrained_grafts_backbones(tmp_path):
    rp, rs, dp = _write_backbones(tmp_path)
    _, v = _init_transfuse_s()
    p0 = jax.device_get(v["params"])

    params, stats, report = apply_pretrained(
        v["params"], v["batch_stats"], "TransFuse_S", str(tmp_path), 32)

    np.testing.assert_array_equal(
        np.asarray(params["resnet"]["conv1"]["kernel"]), rp["conv1"]["kernel"])
    np.testing.assert_array_equal(
        np.asarray(stats["resnet"]["bn1"]["mean"]), rs["bn1"]["mean"])
    np.testing.assert_array_equal(
        np.asarray(params["transformer"]["block0_attn"]["qkv"]["kernel"]),
        dp["block0_attn"]["qkv"]["kernel"])
    np.testing.assert_array_equal(
        np.asarray(params["transformer"]["pos_embed"]), dp["pos_embed"])
    # every backbone leaf matched — nothing silently skipped
    n_backbone = len(jax.tree_util.tree_leaves({"r": rp, "s": rs, "d": dp}))
    assert f"{n_backbone} tensors grafted" in report and "0 skipped" in report
    # non-backbone params untouched
    np.testing.assert_array_equal(
        np.asarray(params["up_c"]["W"]["conv"]["kernel"]),
        np.asarray(p0["up_c"]["W"]["conv"]["kernel"]))


def test_pos_embed_re_resized_on_grid_mismatch(tmp_path, capsys):
    """Blob converted for an 8×8 grid, model trains at grid 2×2 → load-time
    align-corners re-resize (with a warning) instead of a silent skip."""
    _, _, dp = _write_backbones(tmp_path, grid=(8, 8))
    _, v = _init_transfuse_s()
    params, _, report = apply_pretrained(
        v["params"], v["batch_stats"], "TransFuse_S", str(tmp_path), 32)
    out = capsys.readouterr().out
    assert "re-resized" in out
    expect = resize_grid_pos_embed(np.asarray(dp["pos_embed"]), (8, 8), (2, 2))
    np.testing.assert_allclose(
        np.asarray(params["transformer"]["pos_embed"]), expect, atol=1e-6)


def test_non_transfuse_and_missing_files_are_noops(tmp_path):
    _, v = _init_transfuse_s()
    p, s, report = apply_pretrained(
        v["params"], v["batch_stats"], "MDViT", str(tmp_path), 32)
    assert report is None and p is v["params"]
    p, s, report = apply_pretrained(
        v["params"], v["batch_stats"], "TransFuse_S", str(tmp_path), 32)
    assert "no resnet34/deit_small files" in report


def test_trainer_wires_pretrained_folder(tmp_path):
    """The production Trainer path: config.pretrained_folder → grafted init
    (reference: backbones load inside the model constructors)."""
    from mdvit_tpu.config import load_config
    from mdvit_tpu.train.trainer import Trainer

    pre = tmp_path / "pre"
    pre.mkdir()
    rp, _, _ = _write_backbones(pre)
    cfg = load_config(overrides={
        "debug": True,
        "model": "TransFuse_S",
        "pretrained_folder": str(tmp_path / "pre"),
        "data": {"img_size": 32, "synthetic": True,
                 "synthetic_sizes": {"isic2018": [4, 2], "PH2": [4, 2],
                                     "DMF": [4, 2], "SKD": [4, 2]}},
        "train": {"num_epochs": 1, "batch_size": 1},
        "tpu": {"compute_dtype": "float32", "mesh": {"data": 1}},
    })
    tr = Trainer(cfg, str(tmp_path / "exp"))
    np.testing.assert_array_equal(
        np.asarray(tr.state.params["resnet"]["conv1"]["kernel"]),
        rp["conv1"]["kernel"])


def test_pos_embed_grid_derived_from_model_not_config(tmp_path):
    """TransFuse_L_384 pins a non-square token grid regardless of the
    config's square ``data.img_size`` (``TransFuse.py:443``): when the built
    model is passed, apply_pretrained must resize the pos-embed to the
    MODEL's grid, not the config-derived one."""
    _, _, dp = _write_backbones(tmp_path, grid=(2, 2))
    m = TransFuse(img_size=(32, 48), variant="S", sup=False)
    x = np.zeros((1, 32, 48, 3), np.float32)
    v = jax.jit(lambda: m.init(RNGS, x, None, train=False))()
    params, _, report = apply_pretrained(
        v["params"], v["batch_stats"], "TransFuse_S", str(tmp_path),
        32,  # square config size would give grid (2, 2); model is (2, 3)
        model=m)
    expect = resize_grid_pos_embed(np.asarray(dp["pos_embed"]), (2, 2), (2, 3))
    np.testing.assert_allclose(
        np.asarray(params["transformer"]["pos_embed"]), expect, atol=1e-6)
    assert "grafted" in report
