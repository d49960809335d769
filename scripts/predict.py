#!/usr/bin/env python
"""Batch inference CLI — segment new images with a trained checkpoint.

The reference has no standalone inference surface: its closest facility is
re-running the eval protocol over the test csv (``test.only_test=True``,
``multi_train_MDViT.py:79-80``) plus the forward flags ``out_seg/out_feat``
(``mdvit.py:667-730``). This script is the missing serving path: point it at
an experiment directory and a set of images, get predicted masks.

* preprocessing matches the eval pipeline exactly: half-pixel bilinear resize
  to the training resolution (albumentations ``A.Resize`` semantics,
  ``create_dataset.py:141``), then norm01 + ImageNet normalize on device
  (``create_dataset.py:25,143-144``);
* the forward is jitted once at a fixed batch shape (padded final batch), so
  repeated calls stream at device speed;
* predictions use the primary head only, like the reference's val/test loops
  (``multi_train_MDViT.py:378``; TransFuse: map₂, ``multi_train_TransFuse.py:240``).

Usage:
    python scripts/predict.py --ckpt_dir results/mdvit_f4_... \
        --inputs img1.npy img2.png some_dir/ --out_dir preds \
        [--domain 2] [--batch_size 8] [--threshold 0.5] [--save_prob]

``--domain`` sets the Sup-gate one-hot (domain index in the training dataset
list) for domain-conditioned models; models without adapters ignore it.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".npy")


def gather_inputs(paths: list[str]) -> list[str]:
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p))
                if f.lower().endswith(IMG_EXTS)
            )
        else:
            files.append(p)
    if not files:
        raise SystemExit("predict.py: no input images found")
    return files


def load_image(path: str) -> np.ndarray:
    """Return (H, W, 3) float32 on the 0..255 scale."""
    if path.lower().endswith(".npy"):
        arr = np.load(path)
    else:
        from PIL import Image

        arr = np.asarray(Image.open(path).convert("RGB"))
    arr = np.asarray(arr, np.float32)
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, axis=-1)
    if arr.shape[-1] == 4:
        arr = arr[..., :3]
    # float corpora stored on 0..1 (the reference's npy files are 0..255)
    if arr.max() <= 1.0 + 1e-6:
        arr = arr * 255.0
    return arr


def save_mask(path_base: str, mask: np.ndarray, prob: np.ndarray | None):
    try:
        from PIL import Image

        Image.fromarray(mask * np.uint8(255)).save(path_base + "_mask.png")
    except Exception:
        np.save(path_base + "_mask.npy", mask)
    if prob is not None:
        np.save(path_base + "_prob.npy", prob)


def make_forward(model, mkd: bool):
    """Pure inference fn ``(variables, images_0..255, onehot) -> sigmoid
    probability maps (B, H, W)`` with the eval head selection (primary head;
    TransFuse map₂). Shared with ``scripts/export_model.py``."""
    import jax
    import jax.numpy as jnp

    from mdvit_tpu.data.augment import normalize

    def forward(variables, x, onehot):
        x = normalize(x)
        if mkd:
            out = model.apply(variables, x, onehot, train=False,
                              aux_mode="none")
        else:
            out = model.apply(variables, x, onehot, train=False)
        seg = out["seg"]
        if isinstance(seg, tuple) and len(seg) == 3:
            logits = seg[2]  # TransFuse: eval on map₂
        elif isinstance(seg, tuple):
            logits = seg[0]  # MKD: primary head
        else:
            logits = seg
        return jax.nn.sigmoid(logits.astype(jnp.float32))[..., 0]

    return forward


def load_variables(ckpt_dir: str, config, model, mkd: bool, batch_size: int):
    """Init (jitted) then restore the best checkpoint from ``ckpt_dir``."""
    import jax
    import jax.numpy as jnp

    from mdvit_tpu.train import checkpoints as ckpt

    img_size = int(config.data.img_size)
    num_domains = int(config.model_adapt.num_domains)
    # init with a grouped one-sample-per-domain batch so the variable tree
    # includes the MKD debranch params (aux_mode='none' would skip them and
    # the restore `like` tree would mismatch the checkpoint); param shapes
    # are batch-size independent, so the serving batch can differ
    x0 = jnp.zeros((num_domains, img_size, img_size, 3), jnp.float32)
    oh0 = jnp.eye(num_domains, dtype=jnp.float32)

    def _init(key):
        rngs = {"params": key, "dropout": key}
        if mkd:
            return model.init(rngs, x0, oh0, train=False, aux_mode="grouped")
        return model.init(rngs, x0, oh0, train=False)

    variables = jax.jit(_init)(jax.random.PRNGKey(0))
    like = {"params": variables["params"],
            "batch_stats": variables.get("batch_stats", {})}
    restored = ckpt.load_best(ckpt_dir, like)
    return {"params": restored["params"],
            "batch_stats": restored["batch_stats"]}


def main():
    ap = argparse.ArgumentParser(description="mdvit_tpu batch inference")
    ap.add_argument("--ckpt_dir", required=True,
                    help="experiment dir (best checkpoint + exp_config.yml)")
    ap.add_argument("--config_yml", default=None,
                    help="config override (default: <ckpt_dir>/exp_config.yml)")
    ap.add_argument("--inputs", nargs="+", required=True,
                    help="image files (.npy/.png/.jpg/.bmp) and/or directories")
    ap.add_argument("--out_dir", default="predictions")
    ap.add_argument("--domain", type=int, default=0,
                    help="domain index for Sup/DSN-conditioned models")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--save_prob", action="store_true",
                    help="also save the sigmoid probability map as .npy")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mdvit_tpu.config import load_config
    from mdvit_tpu.data.datasets import _resize_bilinear_np
    from mdvit_tpu.train.trainer import (
        _is_mkd_model,
        build_model_from_config,
    )

    cfg_path = args.config_yml or os.path.join(args.ckpt_dir, "exp_config.yml")
    config = load_config(cfg_path if os.path.exists(cfg_path) else None)
    model = build_model_from_config(config)
    mkd = _is_mkd_model(config.model)
    img_size = int(config.data.img_size)
    num_domains = int(config.model_adapt.num_domains)
    if not 0 <= args.domain < num_domains:
        raise SystemExit(
            f"--domain {args.domain} out of range for a {num_domains}-domain "
            "model")

    files = gather_inputs(args.inputs)
    os.makedirs(args.out_dir, exist_ok=True)

    # Cap the jitted micro-batch at 16: on v5e, XLA schedules the stage-1
    # CRPE depthwise convolutions ~6× worse per image at batch 64 than at
    # batch 16 (profiled — README §Serving throughput), so large requested
    # batches stream faster as batch-16 device calls. --batch_size still
    # controls the per-iteration I/O granularity the user sees.
    bs = min(max(1, args.batch_size), 16)
    onehot = jnp.zeros((bs, num_domains), jnp.float32).at[:, args.domain].set(
        1.0)
    variables = load_variables(args.ckpt_dir, config, model, mkd, bs)
    # production XLA overrides (tpu.xla_options): measured +5.5% at the
    # batch-16 serving micro-batch (2589-2594 vs 2430-2477 img/s on v5e);
    # suppressed on CPU backends, which reject TPU flag names
    copts = dict(config.tpu.get("xla_options") or {}) or None
    if jax.default_backend() == "cpu":
        copts = None
    forward = jax.jit(make_forward(model, mkd), compiler_options=copts)

    n_done = 0
    seen: dict = {}
    for start in range(0, len(files), bs):
        chunk = files[start:start + bs]
        batch = np.zeros((bs, img_size, img_size, 3), np.float32)
        for i, f in enumerate(chunk):
            batch[i] = np.clip(
                _resize_bilinear_np(load_image(f), img_size), 0.0, 255.0)
        probs = np.asarray(forward(variables, jnp.asarray(batch), onehot))
        for i, f in enumerate(chunk):
            stem = os.path.splitext(os.path.basename(f))[0]
            # inputs from different directories may share a basename —
            # disambiguate instead of silently overwriting the first mask
            n = seen.get(stem, 0)
            seen[stem] = n + 1
            if n:
                stem = f"{stem}_{n + 1}"
            base = os.path.join(args.out_dir, stem)
            mask = (probs[i] > args.threshold).astype(np.uint8)
            save_mask(base, mask, probs[i] if args.save_prob else None)
            n_done += 1
        print(f"predicted {n_done}/{len(files)}", flush=True)
    print(f"wrote {n_done} masks to {args.out_dir}")


if __name__ == "__main__":
    main()
