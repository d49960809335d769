#!/usr/bin/env python
"""One-shot FULL-SIZE parity artifact: the flagship 256² MDViT config
(dims 64/128/320/512, layers 2/2/2/2, heads 8, mlp_ratios 8/8/4/4 —
``multi_train_MDViT.py:57-60`` + ``mdvit.py:484-503``) compared
logit-for-logit against the ACTUAL imported reference torch model with
converted random-init weights. The per-CI parity test runs at 32² with small
dims for compile-time reasons (tests/test_reference_parity.py); this script
closes the gap once and records the result in a checked-in JSON.

Run on CPU (the torch side has no TPU):
    JAX_PLATFORMS=cpu python scripts/full_size_parity.py \
        --out results/full_size_parity.json
"""
from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_shims():
    """Reuse the timm/turtle shims from the parity test module."""
    spec = importlib.util.spec_from_file_location(
        "ref_parity_shims", os.path.join(ROOT, "tests",
                                         "test_reference_parity.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod._install_shims()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=256)
    ap.add_argument("--b_per", type=int, default=1)
    ap.add_argument("--out", default="results/full_size_parity.json")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    sys.path.insert(0, ROOT)
    _load_shims()

    import jax

    # the axon sitecustomize pins "axon,cpu" via jax.config at interpreter
    # start; override BEFORE backend init so the run stays CPU-only
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from Models.Transformer.mdvit import MDViT as RefMDViT
    from mdvit_tpu.models.mdvit import MDViT
    from mdvit_tpu.train.losses import bce_with_logits, dice_loss
    from scripts.convert_reference_mdvit import (
        check_structure,
        torch_mdvit_to_flax,
    )

    D, B, IMG = 4, args.b_per, args.img
    t0 = time.time()
    torch.manual_seed(0)
    ref = RefMDViT(img_size=IMG, adapt_method="Sup", num_domains=D,
                   decoder_name="MLPFM", drop_rate=0.0, drop_path_rate=0.0)
    ref.eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()
          if "num_batches_tracked" not in k}
    converted = torch_mdvit_to_flax(sd, num_domains=D)

    model = MDViT(img_size=IMG, adapt="Sup", num_domains=D)
    x0 = jnp.zeros((D * B, IMG, IMG, 3))
    oh0 = jnp.repeat(jnp.eye(D, dtype=jnp.float32), B, 0)
    like = jax.jit(
        lambda k: model.init({"params": k, "dropout": k}, x0, oh0,
                             train=False, aux_mode="select")
    )(jax.random.PRNGKey(0))
    check_structure(converted, like)
    variables = jax.tree_util.tree_map(
        lambda c: jnp.asarray(np.asarray(c, np.float32)), converted)
    print(f"[{time.time() - t0:.0f}s] converted; running torch forward",
          flush=True)

    rng = np.random.RandomState(0)
    x = rng.randn(D * B, IMG, IMG, 3).astype(np.float32)
    y = (rng.rand(D * B, IMG, IMG, 1) > 0.5).astype(np.float32)
    onehot = np.repeat(np.eye(D, dtype=np.float32), B, 0)

    ref_out = np.empty((D * B, 1, IMG, IMG), np.float32)
    ref_aux = np.empty((D * B, 1, IMG, IMG), np.float32)
    with torch.no_grad():
        for d in range(D):
            sl = slice(d * B, (d + 1) * B)
            xt = torch.from_numpy(x[sl]).permute(0, 3, 1, 2)
            dl = torch.from_numpy(onehot[sl])
            out, aux = ref(xt, dl, str(d))
            ref_out[sl] = out.numpy()
            ref_aux[sl] = aux.numpy()
    ref_out = np.transpose(ref_out, (0, 2, 3, 1))
    ref_aux = np.transpose(ref_aux, (0, 2, 3, 1))
    print(f"[{time.time() - t0:.0f}s] torch done; compiling jax forward",
          flush=True)

    with jax.default_matmul_precision("highest"):
        out = jax.jit(
            lambda v: model.apply(v, jnp.asarray(x), jnp.asarray(onehot),
                                  train=False, aux_mode="select")
        )(variables)
        got_out = np.asarray(out["seg"][0], np.float32)
        got_aux = np.asarray(out["seg"][1], np.float32)
    print(f"[{time.time() - t0:.0f}s] jax done; comparing", flush=True)

    def stats(a, b):
        d = np.abs(a.astype(np.float64) - b.astype(np.float64))
        scale = float(np.std(b))
        return {
            "max_abs_delta": float(d.max()),
            "mean_abs_delta": float(d.mean()),
            "logit_std": scale,
            "max_rel_to_std": float(d.max() / scale),
        }

    def losses(lg, ag):
        seg_l, aux_l, kt_l = [], [], []
        for d in range(D):
            sl = slice(d * B, (d + 1) * B)
            yv = jnp.asarray(y[sl])
            lgj, agj = jnp.asarray(lg[sl]), jnp.asarray(ag[sl])
            p, apb = jax.nn.sigmoid(lgj), jax.nn.sigmoid(agj)
            seg_l.append(float(bce_with_logits(lgj, yv) + dice_loss(p, yv)))
            aux_l.append(float(bce_with_logits(agj, yv) + dice_loss(apb, yv)))
            kt_l.append(float(dice_loss(apb, p)))
        return {"seg": seg_l, "aux": aux_l, "kt": kt_l}

    want, got = losses(ref_out, ref_aux), losses(got_out, got_aux)
    loss_delta = {
        k: float(np.max(np.abs(np.array(want[k]) - np.array(got[k]))))
        for k in want
    }

    result = {
        "config": {"img_size": IMG, "batch_per_domain": B, "num_domains": D,
                   "embed_dims": [64, 128, 320, 512],
                   "num_layers": [2, 2, 2, 2],
                   "reference": "mdvit.py:474-730 @ multi_train_MDViT.py:57-60"},
        "primary": stats(got_out, ref_out),
        "aux": stats(got_aux, ref_aux),
        "losses_reference": want,
        "losses_ours": got,
        "max_loss_delta": loss_delta,
        "runtime_s": round(time.time() - t0, 1),
        "dtype": "float32 both sides, jax matmul precision=highest",
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
