#!/usr/bin/env python
"""Convert torch checkpoints into mdvit_tpu parameter trees.

Covers the reference's pretrained-weight uses (``TransFuse.py:86,189,293``,
``DeiT.py:100-127``): torchvision ``resnet34/50`` and timm
``deit_small/base_patch16_224`` state dicts mapped into the
``models/transfuse.py`` parameter layout, including the DeiT pos-embed
slice-off-cls + bilinear-resize trick (``DeiT.py:104-111,129-137``).

Layout rules:
  torch Conv2d  (out, in/groups, kh, kw) → flax (kh, kw, in/groups, out)
  torch Linear  (out, in)                → flax (in, out)
  torch BN      weight/bias/running_*    → scale/bias + batch_stats mean/var

Usage:
    python scripts/convert_torch_weights.py --arch resnet34 \
        --ckpt resnet34-333f7ec4.pth --out resnet34_flax.msgpack
"""
from __future__ import annotations

import argparse

import numpy as np


def t2f_conv(w) -> np.ndarray:
    return np.asarray(w).transpose(2, 3, 1, 0)


def t2f_linear(w) -> np.ndarray:
    return np.asarray(w).transpose(1, 0)


def convert_resnet(sd: dict, arch: str = "resnet34"):
    """torchvision resnet → ResNetStem3Stages params/batch_stats trees."""
    params: dict = {}
    stats: dict = {}

    def put_bn(dst: str, src: str):
        params[dst] = {"scale": np.asarray(sd[f"{src}.weight"]),
                       "bias": np.asarray(sd[f"{src}.bias"])}
        stats[dst] = {"mean": np.asarray(sd[f"{src}.running_mean"]),
                      "var": np.asarray(sd[f"{src}.running_var"])}

    params["conv1"] = {"kernel": t2f_conv(sd["conv1.weight"])}
    put_bn("bn1", "bn1")
    n_blocks = {"resnet34": (3, 4, 6), "resnet50": (3, 4, 6)}[arch]
    bottleneck = arch == "resnet50"
    for li, n in enumerate(n_blocks):
        for bi in range(n):
            src = f"layer{li + 1}.{bi}"
            dst = f"layer{li + 1}_{bi}"
            convs = ("conv1", "conv2", "conv3") if bottleneck else ("conv1", "conv2")
            blk_p: dict = {}
            for ci, cname in enumerate(convs, start=1):
                blk_p[f"conv{ci}"] = {
                    "kernel": t2f_conv(sd[f"{src}.conv{ci}.weight"])}
            params[dst] = blk_p
            for ci in range(1, len(convs) + 1):
                put_bn(f"{dst}/bn{ci}".replace("/", "."), f"{src}.bn{ci}")
                params[dst][f"bn{ci}"] = params.pop(f"{dst}.bn{ci}")
                stats.setdefault(dst, {})[f"bn{ci}"] = stats.pop(f"{dst}.bn{ci}")
            if f"{src}.downsample.0.weight" in sd:
                params[dst]["down_conv"] = {
                    "kernel": t2f_conv(sd[f"{src}.downsample.0.weight"])}
                params[dst]["down_bn"] = {
                    "scale": np.asarray(sd[f"{src}.downsample.1.weight"]),
                    "bias": np.asarray(sd[f"{src}.downsample.1.bias"])}
                stats[dst]["down_bn"] = {
                    "mean": np.asarray(sd[f"{src}.downsample.1.running_mean"]),
                    "var": np.asarray(sd[f"{src}.downsample.1.running_var"])}
    return params, stats


def resize_pos_embed(pe: np.ndarray, grid) -> np.ndarray:
    """Drop cls token and bilinearly resize to ``grid`` (int or (gh, gw)) —
    the reference's DeiT trick (``DeiT.py:104-111``; non-square (24, 32) for
    deit_base_384, ``DeiT.py:178-181``), align_corners=True. The resize math
    lives in ONE place: ``mdvit_tpu.train.pretrained.resize_grid_pos_embed``
    (also used for load-time re-resizes)."""
    from mdvit_tpu.train.pretrained import resize_grid_pos_embed

    gh, gw = (grid, grid) if isinstance(grid, int) else (grid[0], grid[1])
    pe = np.asarray(pe)[:, 1:, :]  # remove cls
    side = int(np.sqrt(pe.shape[1]))
    return resize_grid_pos_embed(pe, (side, side), (gh, gw))


def convert_deit(sd: dict, grid: int, depth: int):
    """timm deit state dict → models/transfuse.DeiT params."""
    p: dict = {}
    p["patch_embed"] = {
        "kernel": t2f_conv(sd["patch_embed.proj.weight"]),
        "bias": np.asarray(sd["patch_embed.proj.bias"]),
    }
    p["pos_embed"] = resize_pos_embed(np.asarray(sd["pos_embed"]), grid)
    for i in range(depth):
        s = f"blocks.{i}"
        p[f"block{i}_norm1"] = {"scale": np.asarray(sd[f"{s}.norm1.weight"]),
                                "bias": np.asarray(sd[f"{s}.norm1.bias"])}
        p[f"block{i}_norm2"] = {"scale": np.asarray(sd[f"{s}.norm2.weight"]),
                                "bias": np.asarray(sd[f"{s}.norm2.bias"])}
        p[f"block{i}_attn"] = {
            "qkv": {"kernel": t2f_linear(sd[f"{s}.attn.qkv.weight"]),
                    "bias": np.asarray(sd[f"{s}.attn.qkv.bias"])},
            "proj": {"kernel": t2f_linear(sd[f"{s}.attn.proj.weight"]),
                     "bias": np.asarray(sd[f"{s}.attn.proj.bias"])},
        }
        p[f"block{i}_mlp"] = {
            "fc1": {"kernel": t2f_linear(sd[f"{s}.mlp.fc1.weight"]),
                    "bias": np.asarray(sd[f"{s}.mlp.fc1.bias"])},
            "fc2": {"kernel": t2f_linear(sd[f"{s}.mlp.fc2.weight"]),
                    "bias": np.asarray(sd[f"{s}.mlp.fc2.bias"])},
        }
    p["norm"] = {"scale": np.asarray(sd["norm.weight"]),
                 "bias": np.asarray(sd["norm.bias"])}
    return p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", required=True,
                    choices=["resnet34", "resnet50", "deit_small", "deit_base"])
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--grid", type=int, default=16,
                    help="token grid side for DeiT pos-embed resize")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch
    from flax.serialization import msgpack_serialize

    ckpt = torch.load(args.ckpt, map_location="cpu")
    sd = ckpt.get("model", ckpt)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    if args.arch.startswith("resnet"):
        params, stats = convert_resnet(sd, args.arch)
        blob = {"params": params, "batch_stats": stats}
    else:
        depth = 8 if args.arch == "deit_small" else 12
        g = args.grid
        blob = {"params": convert_deit(sd, g, depth),
                "meta": {"arch": args.arch,
                         "grid": [g, g] if isinstance(g, int) else list(g)}}
    with open(args.out, "wb") as f:
        f.write(msgpack_serialize(blob))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
