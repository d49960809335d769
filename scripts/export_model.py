#!/usr/bin/env python
"""Export a trained model's inference function as a serialized StableHLO
artifact (``jax.export``) for deployment without Python model code.

The artifact embeds the eval preprocessing (norm01 + ImageNet normalize) and
head selection, takes ``(images_0..255 (B,S,S,3) f32, domain_onehot (B,D)
f32)``, and returns sigmoid probability maps ``(B,S,S)`` — the serving
counterpart of the reference's ``test.only_test`` path
(``multi_train_MDViT.py:79-80``). Weights are baked in as constants.

Usage:
    python scripts/export_model.py --ckpt_dir results/mdvit_... \
        --out model.stablehlo [--batch_size 8] [--check]

Reload anywhere with jax:
    from jax import export
    fn = export.deserialize(open("model.stablehlo", "rb").read()).call
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description="mdvit_tpu StableHLO export")
    ap.add_argument("--ckpt_dir", required=True)
    ap.add_argument("--config_yml", default=None)
    ap.add_argument("--out", default="model.stablehlo")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--check", action="store_true",
                    help="deserialize the artifact and verify it reproduces "
                         "the live forward on random inputs")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export

    from mdvit_tpu.config import load_config
    from mdvit_tpu.train.trainer import (
        _is_mkd_model,
        build_model_from_config,
    )
    from scripts.predict import load_variables, make_forward

    cfg_path = args.config_yml or os.path.join(args.ckpt_dir, "exp_config.yml")
    config = load_config(cfg_path if os.path.exists(cfg_path) else None)
    model = build_model_from_config(config)
    mkd = _is_mkd_model(config.model)
    img_size = int(config.data.img_size)
    num_domains = int(config.model_adapt.num_domains)
    bs = max(1, args.batch_size)

    variables = load_variables(args.ckpt_dir, config, model, mkd, bs)
    forward = make_forward(model, mkd)
    serve = jax.jit(lambda x, onehot: forward(variables, x, onehot))

    x_spec = jax.ShapeDtypeStruct((bs, img_size, img_size, 3), jnp.float32)
    oh_spec = jax.ShapeDtypeStruct((bs, num_domains), jnp.float32)
    exported = export.export(serve)(x_spec, oh_spec)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out}: {len(blob) / 1e6:.2f} MB, "
          f"in_shapes={[(bs, img_size, img_size, 3), (bs, num_domains)]}, "
          f"platforms={exported.platforms}")

    if args.check:
        rng = np.random.RandomState(0)
        x = jnp.asarray(
            rng.randint(0, 255, (bs, img_size, img_size, 3)).astype(
                np.float32))
        oh = jnp.zeros((bs, num_domains), jnp.float32).at[:, 0].set(1.0)
        want = np.asarray(serve(x, oh))
        got = np.asarray(export.deserialize(blob).call(x, oh))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        print("check ok: deserialized artifact matches the live forward")


if __name__ == "__main__":
    main()
