"""Pretrained-backbone initialization for TransFuse models.

The reference *always* builds TransFuse from ImageNet checkpoints: torchvision
``resnet34/50`` and timm DeiT, merged with the partial-state-dict loader
``load_pretrain`` (``pieces.py:56-73``; uses at ``TransFuse.py:86,189,293``,
``DeiT.py:100-127``). The TPU-native pipeline splits that into two steps:

1. offline, once: ``scripts/convert_torch_weights.py --arch resnet34 ...``
   turns each torch checkpoint into an msgpack tree matching our
   ``models/transfuse.py`` parameter layout (incl. the pos-embed
   slice-off-cls + align-corners bilinear resize, ``DeiT.py:104-137``);
2. at trainer init: ``apply_pretrained`` grafts those trees into the freshly
   initialized variables when ``config.pretrained_folder`` is set — same
   partial-merge semantics as ``load_pretrain`` (only name+shape matches are
   taken, a matched/total report is printed).
"""
from __future__ import annotations

import os
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# model registry name → (file stem for the CNN branch, file stem for the ViT
# branch); the stems double as the converter's --arch values
TRANSFUSE_BACKBONES = {
    "TransFuse_S": ("resnet34", "deit_small"),
    "TransFuse_S_adapt": ("resnet34", "deit_small"),
    "TransFuse_L": ("resnet50", "deit_base"),
    "TransFuse_L_384": ("resnet50", "deit_base"),
}


def resize_grid_pos_embed(pe: np.ndarray, src_hw, dst_hw) -> np.ndarray:
    """Align-corners bilinear resize of a cls-free pos embed ``(1, N, C)``
    from grid ``src_hw`` to ``dst_hw`` (``DeiT.py:104-111`` semantics)."""
    sh, sw = src_hw
    gh, gw = dst_hw
    c = pe.shape[2]
    img = np.asarray(pe).reshape(sh, sw, c)
    if (sh, sw) == (gh, gw):
        return img.reshape(1, gh * gw, c)
    ys = np.linspace(0, sh - 1, gh) if gh > 1 else np.zeros(1)
    xs = np.linspace(0, sw - 1, gw) if gw > 1 else np.zeros(1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, sh - 1)
    x1 = np.minimum(x0 + 1, sw - 1)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    top = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
    bot = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    return out.reshape(1, gh * gw, c).astype(pe.dtype)


def _merge(dst: Any, src: Any, path: str, matched: list, skipped: list):
    """``load_pretrain``-style partial merge: take a source leaf only when the
    destination has the same path and shape; count both outcomes."""
    from collections.abc import Mapping

    if isinstance(src, Mapping) and isinstance(dst, Mapping):
        out = dict(dst)
        for k, v in src.items():
            if k in dst:
                out[k] = _merge(dst[k], v, f"{path}/{k}", matched, skipped)
            else:
                skipped.append(f"{path}/{k}")
        return out
    if hasattr(dst, "shape") and tuple(np.shape(src)) == tuple(dst.shape):
        matched.append(path)
        return jnp.asarray(np.asarray(src), dtype=dst.dtype)
    skipped.append(path)
    return dst


def _load_blob(path: str):
    from flax.serialization import msgpack_restore

    with open(path, "rb") as f:
        return msgpack_restore(f.read())


def apply_pretrained(
    params: Any,
    batch_stats: Any,
    model_name: str,
    folder: str,
    img_size,
    model: Any = None,
) -> Tuple[Any, Any, str | None]:
    """Graft converted backbone trees from ``folder`` into TransFuse init
    variables. Non-TransFuse models and missing files are no-ops (the
    reference only pretrains the TransFuse family). Returns
    ``(params, batch_stats, report | None)``."""
    stems = TRANSFUSE_BACKBONES.get(model_name)
    if stems is None or not folder:
        return params, batch_stats, None
    resnet_stem, deit_stem = stems
    # The token grid must come from the MODEL, not the config: the registry
    # builder may override the configured size (TransFuse_L_384 is pinned to
    # the reference's fixed 384×512 / (24, 32) grid regardless of
    # ``data.img_size``, ``TransFuse.py:443``)
    if model is not None and getattr(model, "img_size", None) is not None:
        img_size = model.img_size
    ih, iw = (img_size, img_size) if isinstance(img_size, int) else img_size
    grid = (ih // 16, iw // 16)
    dst_pe = params.get("transformer", {}).get("pos_embed")
    if dst_pe is not None and dst_pe.shape[1] != grid[0] * grid[1]:
        print(
            f"[pretrained] WARNING: model pos_embed has {dst_pe.shape[1]} "
            f"tokens but the derived grid {grid} has {grid[0] * grid[1]}; "
            "the DeiT pos-embed graft will be skipped (pass the built model "
            "so the grid can be derived from it)"
        )
    matched: list = []
    skipped: list = []
    used_files = []

    def find(stem: str):
        for ext in (".msgpack", ""):
            p = os.path.join(folder, stem + ext)
            if os.path.isfile(p):
                return p
        return None

    rp = find(resnet_stem)
    if rp is not None:
        blob = _load_blob(rp)
        params = dict(params)
        params["resnet"] = _merge(
            params["resnet"], blob.get("params", {}), "resnet",
            matched, skipped)
        if batch_stats and "resnet" in batch_stats:
            batch_stats = dict(batch_stats)
            batch_stats["resnet"] = _merge(
                batch_stats["resnet"], blob.get("batch_stats", {}),
                "resnet(stats)", matched, skipped)
        used_files.append(os.path.basename(rp))

    dp = find(deit_stem)
    if dp is not None:
        blob = _load_blob(dp)
        tree = dict(blob.get("params", {}))
        meta = blob.get("meta", {})
        pe = tree.get("pos_embed")
        if pe is not None and np.shape(pe)[1] != grid[0] * grid[1]:
            src = meta.get("grid")
            if src is None:
                side = int(np.sqrt(np.shape(pe)[1]))
                src = (side, side)
            tree["pos_embed"] = resize_grid_pos_embed(
                np.asarray(pe), tuple(int(s) for s in src), grid)
            print(
                f"[pretrained] pos_embed re-resized {tuple(src)}→{grid}; "
                f"convert with --grid {grid[0]} for single-pass resize parity"
            )
        params = dict(params)
        params["transformer"] = _merge(
            params["transformer"], tree, "transformer", matched, skipped)
        used_files.append(os.path.basename(dp))

    if not used_files:
        return params, batch_stats, (
            f"[pretrained] no {resnet_stem}/{deit_stem} files in {folder}; "
            "training from random init")
    report = (
        f"[pretrained] loaded {', '.join(used_files)}: "
        f"{len(matched)} tensors grafted, {len(skipped)} skipped"
    )
    return params, batch_stats, report
