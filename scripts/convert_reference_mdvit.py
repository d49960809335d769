#!/usr/bin/env python
"""Convert a reference (siyi-wind/MDViT) torch ``MDViT`` checkpoint into
``mdvit_tpu`` flax variables.

Covers the flagship configuration (``adapt_method='Sup'``,
``decoder_name='MLPFM'``, shared conv norms — ``multi_train_MDViT.py:57-60``).
Layout transforms:

* torch conv OIHW → flax HWIO; torch linear (out,in) → flax (in,out).
* CRPE per-window convs ``crpe.conv_list.{0,1,2}`` → per-window params
  ``w3/b3, w5/b5, w7/b7`` (the fusion into one kernel happens at call time,
  ``ops/../blocks.py:ConvRelPosEnc``).
* decoder ``conv_after.dwconv`` (2C→C, groups=C, ``Decoders.py:30-38``) →
  ``dwconv_kernel (k,k,2,C)`` for the even/odd depthwise decomposition.
* the four ``debranch{1..4}`` MLPDecoderFM modules → ONE nn.vmap-stacked
  ``debranch`` subtree with a leading domain axis.
* BN running_mean/var → the ``batch_stats`` collection.

Usage:
    python scripts/convert_reference_mdvit.py --torch_ckpt best.pth \
        --out converted_orbax_dir [--img_size 256]
"""
from __future__ import annotations

import argparse

import numpy as np


def t2f_conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def t2f_lin(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (1, 0)))


def _conv(sd, p):
    out = {"kernel": t2f_conv(sd[f"{p}.weight"])}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def _dense(sd, p):
    out = {"kernel": t2f_lin(sd[f"{p}.weight"])}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def _bn(sd, p):
    return (
        {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]},
        {"mean": sd[f"{p}.running_mean"], "var": sd[f"{p}.running_var"]},
    )


def _ln(sd, p):
    return {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}


# ---- DSN ("_M") per-domain norm stacks (``mdvit.py:735-960``): every
# ``nn.ModuleList`` of norms becomes ONE (D, C) leaf pair matching
# ``DomainBatchNorm(affine_per_domain/stats_per_domain)`` /
# ``DomainLayerNorm(per_domain=True)`` ----

def _bn_m(sd, p, d):
    return (
        {"scale": np.stack([sd[f"{p}.{i}.weight"] for i in range(d)]),
         "bias": np.stack([sd[f"{p}.{i}.bias"] for i in range(d)])},
        {"mean": np.stack([sd[f"{p}.{i}.running_mean"] for i in range(d)]),
         "var": np.stack([sd[f"{p}.{i}.running_var"] for i in range(d)])},
    )


def _ln_m(sd, p, d):
    return {"scale": np.stack([sd[f"{p}.{i}.weight"] for i in range(d)]),
            "bias": np.stack([sd[f"{p}.{i}.bias"] for i in range(d)])}


def _convbn_m(sd, p, d):
    """Conv2d_BN_M (``mdvit.py:23-70``): conv (no bias) + per-domain bns."""
    bn_p, bn_s = _bn_m(sd, f"{p}.bns", d)
    return (
        {"conv": {"kernel": t2f_conv(sd[f"{p}.conv.weight"])}, "bn": bn_p},
        {"bn": bn_s},
    )


def _dwconvbn_m(sd, p, d):
    """mdvit.py's DWConv2d_BN_M (``mdvit.py:127-180``): dw in→in groups=in,
    pw in→out, per-domain bns. Used by the DSN patch embeds."""
    bn_p, bn_s = _bn_m(sd, f"{p}.bns", d)
    return (
        {
            "dwconv": {"kernel": t2f_conv(sd[f"{p}.dwconv.weight"])},
            "pwconv": {"kernel": t2f_conv(sd[f"{p}.pwconv.weight"])},
            "bn": bn_p,
        },
        {"bn": bn_s},
    )


def _dwconvbn_out_m(sd, p, d):
    """Decoders.py's DWConv2d_BN_M (``Decoders.py:66-106``): SAME conv
    geometry as the plain decoder DWConv2d_BN (dw 2C→C groups=C → our
    even/odd ``dwconv_kernel``, pw C→C) but per-domain bns."""
    bn_p, bn_s = _bn_m(sd, f"{p}.bns", d)
    w = sd[f"{p}.dwconv.weight"]  # (C, 2, k, k)
    return (
        {
            "dwconv_kernel": t2f_conv(w),  # (k, k, 2, C)
            "pwconv": {"kernel": t2f_conv(sd[f"{p}.pwconv.weight"])},
            "bn": bn_p,
        },
        {"bn": bn_s},
    )


def _convbn(sd, p):
    """Conv2d_BN (``mpvit.py:81-124``): conv (no bias) + bn."""
    bn_p, bn_s = _bn(sd, f"{p}.bn")
    return (
        {"conv": {"kernel": t2f_conv(sd[f"{p}.conv.weight"])}, "bn": bn_p},
        {"bn": bn_s},
    )


def _dwconvbn_in(sd, p):
    """DWConv2d_BN patch-embed wiring (``mdvit.py:85-123``): dw in→in
    groups=in, pw in→out, bn."""
    bn_p, bn_s = _bn(sd, f"{p}.bn")
    return (
        {
            "dwconv": {"kernel": t2f_conv(sd[f"{p}.dwconv.weight"])},
            "pwconv": {"kernel": t2f_conv(sd[f"{p}.pwconv.weight"])},
            "bn": bn_p,
        },
        {"bn": bn_s},
    )


def _dwconvbn_out(sd, p):
    """Decoder conv_after (``Decoders.py:15-63``): dw 2C→C groups=C →
    our even/odd ``dwconv_kernel (k,k,2,C)``, pw C→C, bn."""
    bn_p, bn_s = _bn(sd, f"{p}.bn")
    w = sd[f"{p}.dwconv.weight"]  # (C, 2, k, k)
    return (
        {
            "dwconv_kernel": t2f_conv(w),  # (k, k, 2, C)
            "pwconv": {"kernel": t2f_conv(sd[f"{p}.pwconv.weight"])},
            "bn": bn_p,
        },
        {"bn": bn_s},
    )


CRPE_WINDOWS = (3, 5, 7)


def _mhsa_stage(sd, p, num_layers, sup, dsn=False, num_domains=4):
    """MHSA_stage_adapt (``mdvit.py:415-469``) / MHSA_stage_adapt_M
    (``:443-471``): shared cpe/crpe + ``mhca_blks`` serial blocks; the _M
    blocks hold per-domain ``norm1s/norm2s`` ModuleLists (``:377,392``)."""
    params = {"cpe": {"proj": _conv(sd, f"{p}.cpe.proj")}, "crpe": {}}
    for i, win in enumerate(CRPE_WINDOWS):
        w = sd[f"{p}.crpe.conv_list.{i}.weight"]  # (c_split, 1, k, k)
        params["crpe"][f"w{win}"] = t2f_conv(w)  # (k, k, 1, c_split)
        params["crpe"][f"b{win}"] = sd[f"{p}.crpe.conv_list.{i}.bias"]
    for j in range(num_layers):
        bp = f"{p}.mhca_blks.{j}"
        att = {
            "qkv": _dense(sd, f"{bp}.factoratt_crpe.qkv"),
            "proj": _dense(sd, f"{bp}.factoratt_crpe.proj"),
        }
        if sup:
            att["domain_layer_fc1"] = _dense(
                sd, f"{bp}.factoratt_crpe.domain_layer.0")
            att["domain_layer_fc2"] = _dense(
                sd, f"{bp}.factoratt_crpe.domain_layer.2")
        if dsn:
            norm1 = _ln_m(sd, f"{bp}.norm1s", num_domains)
            norm2 = _ln_m(sd, f"{bp}.norm2s", num_domains)
        else:
            norm1 = _ln(sd, f"{bp}.norm1")
            norm2 = _ln(sd, f"{bp}.norm2")
        params[f"block{j}"] = {
            "norm1": norm1,
            "norm2": norm2,
            "factoratt_crpe": att,
            "mlp": {
                "fc1": _dense(sd, f"{bp}.mlp.fc1"),
                "fc2": _dense(sd, f"{bp}.mlp.fc2"),
            },
        }
    return params


def _decoder(sd, p):
    """UnetDecodingBlockTransformer (``Decoders.py:174-214``), without the
    mhsa stage (which lives as a sibling ``decoder{n}_mhsa`` in our tree)."""
    ca_p, ca_s = _dwconvbn_out(sd, f"{p}.conv_after")
    return (
        {"conv_before": _conv(sd, f"{p}.conv_before"), "conv_after": ca_p},
        {"conv_after": ca_s},
    )


def _mlpfm(sd, p):
    """MLPDecoderFM (``Decoders.py:289-339``)."""
    fuse_bn_p, fuse_bn_s = _bn(sd, f"{p}.linear_fuse.1")
    params = {
        f"linear{i}": _conv(sd, f"{p}.linear{i}") for i in range(1, 5)
    }
    params["fuse_conv"] = _conv(sd, f"{p}.linear_fuse.0")
    params["fuse_bn"] = fuse_bn_p
    params["linear_out"] = _conv(sd, f"{p}.linear_out")
    return params, {"fuse_bn": fuse_bn_s}


def _stack(trees):
    """Stack a list of identical pytrees along a new leading (domain) axis."""
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *trees)


def torch_mdvit_to_flax(
    state_dict: dict,
    num_layers=(2, 2, 2, 2),
    sup: bool = True,
    num_domains: int = 4,
    dsn: bool = False,
) -> dict:
    """Reference MDViT state_dict (numpy values) → ``{'params', 'batch_stats'}``
    flax variables for ``mdvit_tpu.models.mdvit.MDViT``.

    ``dsn=True`` converts the MDViT_DSN tree (``mdvit.py:735-960``): stems
    become ``stem_1/stem_2`` Conv2d_BN_M, every ModuleList of per-domain
    norms stacks into one (D, C) leaf pair, and the bridge norms live at
    ``bridge_norms{1,2}``. Conv geometries are unchanged vs the non-DSN
    tree (Decoders.py's DWConv2d_BN_M keeps the 2-ch-grouped decoder
    conv_after)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    d = num_domains
    core_p, core_s = {}, {}

    for i, name in enumerate(["stem1", "stem2"]):
        if dsn:
            pp, ss = _convbn_m(sd, f"stem_{i + 1}", d)
        else:
            pp, ss = _convbn(sd, f"stem.{i}")
        core_p[name], core_s[name] = pp, ss

    for i in range(4):
        pe = f"patch_embed_stages.{i}.patch_conv"
        pp, ss = (_dwconvbn_m(sd, pe, d) if dsn else _dwconvbn_in(sd, pe))
        core_p[f"patch_embed{i}"], core_s[f"patch_embed{i}"] = pp, ss
        core_p[f"mhsa_stage{i}"] = _mhsa_stage(
            sd, f"mhsa_stages.{i}", num_layers[i], sup, dsn, d)

    if dsn:
        core_p["bridge_conv1"] = _conv(sd, "bridge_conv1")
        core_p["bridge_bn1"], core_s["bridge_bn1"] = _bn_m(
            sd, "bridge_norms1", d)
        core_p["bridge_conv2"] = _conv(sd, "bridge_conv2")
        core_p["bridge_bn2"], core_s["bridge_bn2"] = _bn_m(
            sd, "bridge_norms2", d)
    else:
        core_p["bridge_conv1"] = _conv(sd, "bridge.0")
        core_p["bridge_bn1"], core_s["bridge_bn1"] = _bn(sd, "bridge.1")
        core_p["bridge_conv2"] = _conv(sd, "bridge.3")
        core_p["bridge_bn2"], core_s["bridge_bn2"] = _bn(sd, "bridge.4")

    for n in range(1, 5):
        if dsn:
            ca_p, ca_s = _dwconvbn_out_m(sd, f"decoder{n}.conv_after", d)
            dp = {"conv_before": _conv(sd, f"decoder{n}.conv_before"),
                  "conv_after": ca_p}
            ds = {"conv_after": ca_s}
        else:
            dp, ds = _decoder(sd, f"decoder{n}")
        core_p[f"decoder{n}"], core_s[f"decoder{n}"] = dp, ds
        # decoder{1..4} wrap encoder stages {3..0}'s mhsa config
        core_p[f"decoder{n}_mhsa"] = _mhsa_stage(
            sd, f"decoder{n}.mhsa_block", num_layers[4 - n], sup, dsn, d)

    params = {
        "core": core_p,
        "finalconv": _conv(sd, "finalconv.0"),
    }
    stats = {"core": core_s}

    deb = [_mlpfm(sd, f"debranch{k}") for k in range(1, num_domains + 1)]
    params["debranch"] = _stack([d[0] for d in deb])
    stats["debranch"] = _stack([d[1] for d in deb])
    return {"params": params, "batch_stats": stats}


def check_structure(converted, like) -> None:
    """Raise with a readable diff if the converted tree does not match the
    model's init'd variables (paths and shapes)."""
    import jax

    def flat(tree):
        return {
            jax.tree_util.keystr(p): tuple(np.shape(v))
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    got, want = flat(converted), flat(like)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    badshape = sorted(
        k for k in set(got) & set(want) if got[k] != want[k]
    )
    if missing or extra or badshape:
        lines = [f"missing: {m} {want[m]}" for m in missing]
        lines += [f"extra: {e} {got[e]}" for e in extra]
        lines += [f"shape: {b} got {got[b]} want {want[b]}" for b in badshape]
        raise ValueError("converted tree mismatch:\n" + "\n".join(lines))


def main():
    import jax
    import jax.numpy as jnp
    import torch

    from mdvit_tpu.models.mdvit import MDViT
    from mdvit_tpu.train import checkpoints as ckpt

    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--img_size", type=int, default=256)
    ap.add_argument("--num_domains", type=int, default=4)
    ap.add_argument("--dsn", action="store_true",
                    help="checkpoint is an MDViT_DSN tree (per-domain norms)")
    args = ap.parse_args()

    sd = torch.load(args.torch_ckpt, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k.removeprefix("module."): v.numpy() for k, v in sd.items()}
    converted = torch_mdvit_to_flax(sd, num_domains=args.num_domains,
                                    dsn=args.dsn)

    model = MDViT(img_size=args.img_size, adapt="Sup", dsn=args.dsn,
                  num_domains=args.num_domains)
    x = jnp.zeros((args.num_domains, args.img_size, args.img_size, 3))
    oh = jnp.eye(args.num_domains, dtype=jnp.float32)
    like = jax.jit(
        lambda k: model.init({"params": k, "dropout": k}, x, oh,
                             train=False, aux_mode="grouped")
    )(jax.random.PRNGKey(0))
    check_structure(converted, like)
    ckpt.save_pytree(args.out, converted)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
