#!/usr/bin/env python
"""Serving benchmark: inference throughput/latency for the flagship model.

The train-step benchmark (``bench.py``) is the driver-tracked number; this
companion measures the SERVING path — the same jitted forward used by
``scripts/predict.py`` and the StableHLO export (primary head only, eval
protocol: ``multi_train_MDViT.py:378``) — across batch sizes, on one chip.

Prints one JSON line per batch size:
    {"metric": "mdvit_256_infer", "batch": B, "img_per_sec": ...,
     "latency_ms": ...}

Usage: python scripts/bench_infer.py [--model MDViT] [--img 256]
       [--batches 1,4,16,64] [--dtype bf16|fp32] [--iters 30]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="MDViT")
    ap.add_argument("--img", type=int, default=256)
    ap.add_argument("--batches", default="1,4,16,64")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a 10-iteration device trace per batch size "
                         "into DIR/b<batch> (roll up with parse_xplane.py)")
    args = ap.parse_args()

    from mdvit_tpu.models.registry import get_model
    from mdvit_tpu.train.trainer import _is_mkd_model

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from predict import make_forward

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    num_domains = 4
    model = get_model(args.model, img_size=args.img, num_domains=num_domains,
                      adapt_method="Sup", dtype=dtype)
    mkd = _is_mkd_model(args.model)

    # random weights: throughput is value-independent, and serving perf must
    # be measurable without a trained checkpoint
    x0 = jnp.zeros((num_domains, args.img, args.img, 3), jnp.float32)
    oh0 = jnp.eye(num_domains, dtype=jnp.float32)

    def _init(key):
        rngs = {"params": key, "dropout": key}
        if mkd:
            return model.init(rngs, x0, oh0, train=False, aux_mode="grouped")
        return model.init(rngs, x0, oh0, train=False)

    variables = jax.jit(_init)(jax.random.PRNGKey(0))
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    # production default = config tpu.xla_options (what predict.py serves
    # with; +5.5% at batch 16); the MDVIT_BENCH_XLA_OPTS="k=v,..." knob
    # REPLACES it for experiments (e.g. probing whether a scoped-vmem
    # setting changes the B=64 CRPE schedule pathology — it doesn't)
    from mdvit_tpu.config import load_config
    opts_env = os.environ.get("MDVIT_BENCH_XLA_OPTS")
    if opts_env:
        copts = dict(kv.split("=", 1) for kv in opts_env.split(","))
    else:
        copts = dict(load_config().tpu.get("xla_options") or {}) or None
        if jax.default_backend() == "cpu":
            copts = None
    forward = jax.jit(make_forward(model, mkd), compiler_options=copts)

    rng = np.random.RandomState(0)
    for b in [int(s) for s in args.batches.split(",") if s]:
        x = jnp.asarray(
            rng.rand(b, args.img, args.img, 3).astype(np.float32) * 255.0)
        onehot = jnp.zeros((b, num_domains), jnp.float32).at[:, 0].set(1.0)
        probs = None
        for _ in range(args.warmup):
            probs = forward(variables, x, onehot)
        jax.block_until_ready(probs)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            probs = forward(variables, x, onehot)
        jax.block_until_ready(probs)
        dt = time.perf_counter() - t0
        if args.profile:
            with jax.profiler.trace(os.path.join(args.profile, f"b{b}")):
                for _ in range(10):
                    probs = forward(variables, x, onehot)
                jax.block_until_ready(probs)
        print(json.dumps({
            "metric": f"{args.model.lower()}_{args.img}_infer",
            "batch": b,
            "img_per_sec": round(b * args.iters / dt, 1),
            "latency_ms": round(dt / args.iters * 1e3, 2),
            "dtype": args.dtype,
        }))


if __name__ == "__main__":
    main()
