#!/usr/bin/env python
"""Comparator-zoo TPU benchmark: jitted train-step img/s for every model the
reference trains through its dispatch table (``multi_train_BASE.py:66-88``,
``multi_train_TransFuse.py:95-110``), at the reference recipe (256², batch
4/domain over 4 domains, AdamW, on-device augmentation) — the same harness as
``bench.py`` but swept over the zoo.

The flagship number stays ``bench.py``'s one-line contract; this script
exists so "the comparators ride the same kernel substrate" is a *measured*
claim, not an asserted one (a pathological lowering in one model — cf. the
stage-1 CRPE ``convolution_add_fusion`` at serving batch 64 — is invisible
until each model has its own number).

Prints one JSON line per model and writes ``results/bench_zoo.json``.

Usage: python scripts/bench_zoo.py [--models BASE,SwinUnet,...] [--iters 30]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# reference dispatch table order (multi_train_BASE.py:66-88 + the TransFuse
# and MDViT entry points); MDViT is included as a cross-check against
# bench.py's driver-tracked number
DEFAULT_MODELS = (
    "BASE,BASE_DSN,BASE_DASE,BASE_USE,UTNet,SwinUnet,SwinUNETR,"
    "TransFuse_S,MDViT,MDViT_DSN"
)
BATCH_PER_DOMAIN = 4
NUM_DOMAINS = 4
IMG = 256


def bench_one(name: str, iters: int, warmup: int) -> dict:
    from mdvit_tpu.config import load_config
    from mdvit_tpu.models.registry import get_model
    from mdvit_tpu.train.optim import build_optimizer
    from mdvit_tpu.train.steps import TrainState, make_train_step
    from mdvit_tpu.train.trainer import _is_mkd_model

    mkd = _is_mkd_model(name)
    model = get_model(name, img_size=IMG, num_domains=NUM_DOMAINS,
                      adapt_method="Sup", dtype=jnp.bfloat16)
    b = BATCH_PER_DOMAIN
    x = jnp.zeros((NUM_DOMAINS * b, IMG, IMG, 3), jnp.float32)
    onehot = jnp.repeat(jnp.eye(NUM_DOMAINS, dtype=jnp.float32), b, 0)

    def _init(key):
        rngs = {"params": key, "dropout": key}
        if mkd:
            return model.init(rngs, x, onehot, train=False, aux_mode="grouped")
        return model.init(rngs, x, onehot, train=False)

    variables = jax.jit(_init)(jax.random.PRNGKey(0))
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(
            variables["params"])
    )

    config = load_config()
    tx = build_optimizer(config, steps_per_epoch=648)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        rng=jax.random.PRNGKey(1),
    )

    rng = np.random.RandomState(0)
    n_store = 64
    images = tuple(
        jax.device_put(rng.randint(0, 255, (n_store, IMG, IMG, 3), np.uint8))
        for _ in range(NUM_DOMAINS)
    )
    masks = tuple(
        jax.device_put((rng.rand(n_store, IMG, IMG) > 0.5).astype(np.uint8))
        for _ in range(NUM_DOMAINS)
    )

    step = make_train_step(model, tx, NUM_DOMAINS, alpha=0.5, det_sup=mkd,
                           mkd=mkd, device_augment=True, donate=True)

    def idx(i):
        return jnp.asarray(
            (np.arange(NUM_DOMAINS * b, dtype=np.int32) * (i + 1)) % n_store
        ).reshape(NUM_DOMAINS, b)

    # AOT-compile (like bench.py) so the XLA cost model's flops / bytes
    # accessed can be read off the SAME executable that is timed — this is
    # what turns a slow number into an *attributed* one (compute-bound vs
    # bandwidth-bound vs badly lowered)
    run = step
    flops = bytes_acc = None
    t_c0 = time.perf_counter()
    try:
        compiled = step.lower(state, images, masks, idx(0)).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
        bytes_acc = float(ca.get("bytes accessed", 0.0)) or None
        run = compiled
    except Exception:
        pass  # fall back to the jit dispatch path, no cost analysis
    for i in range(warmup):
        state, metrics = run(state, images, masks, idx(i))
    jax.block_until_ready(state.params)
    compile_s = time.perf_counter() - t_c0

    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = run(state, images, masks, idx(i))
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    step_s = dt / iters
    out = {
        "model": name,
        "img_per_sec": round(NUM_DOMAINS * b * iters / dt, 1),
        "step_ms": round(step_s * 1e3, 2),
        "params_M": round(n_params / 1e6, 2),
        "compile_s": round(compile_s, 1),
        "mkd": mkd,
    }
    if flops:
        # v5e: 197 TF/s bf16 peak, 819 GB/s HBM
        out["gflops_step"] = round(flops / 1e9, 1)
        out["mfu"] = round(flops / step_s / 197e12, 4)
    if bytes_acc:
        out["gbytes_step"] = round(bytes_acc / 1e9, 2)
        out["hbm_util"] = round(bytes_acc / step_s / 819e9, 4)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=DEFAULT_MODELS)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--out", default="results/bench_zoo.json")
    args = ap.parse_args()

    results = []
    for name in [m for m in args.models.split(",") if m]:
        try:
            r = bench_one(name, args.iters, args.warmup)
        except Exception as e:  # one pathological model must not end the sweep
            traceback.print_exc(file=sys.stderr)
            r = {"model": name, "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(r), flush=True)
        results.append(r)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    # merge by model name so a subset re-run (e.g. enriching two models with
    # cost analysis) updates rather than clobbers the sweep artifact
    merged = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            for r in json.load(f).get("results", []):
                merged[r["model"]] = r
    for r in results:
        merged[r["model"]] = r
    order = [m for m in DEFAULT_MODELS.split(",")]
    ordered = [merged[m] for m in order if m in merged] + [
        r for m, r in merged.items() if m not in order]
    with open(args.out, "w") as f:
        json.dump({"config": {"img": IMG, "batch_per_domain": BATCH_PER_DOMAIN,
                              "num_domains": NUM_DOMAINS, "dtype": "bf16",
                              "iters": args.iters},
                   "results": ordered}, f, indent=1)


if __name__ == "__main__":
    main()
