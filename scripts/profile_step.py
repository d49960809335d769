#!/usr/bin/env python
"""Step-time breakdown for the flagship 4-domain MDViT train step on TPU.

Timing through the axon tunnel lies for unchained async calls, so every
measurement chains state: each variant is measured as a loop of jitted calls
whose output feeds the next call's input (donated where possible), with one
``block_until_ready`` at the end.

Phases measured:
  full        — production train step (aug + fwd + det_sup double-vjp + adamw)
  single_bwd  — det_sup=False (one vjp pull)
  no_aug      — device_augment=False
  fwd_train   — forward only, train=True (BN group stats, dropout)
  fwd_eval    — forward only, train=False
  encoder     — stem+stages only (out_seg=False)
  no_debranch — forward without the MKD debranch (aux_mode='none')
  augment     — gather + augment only
  optimizer   — adamw update on cached grads

Also prints FLOP-based MFU for the full step.

Usage: python scripts/profile_step.py  (real TPU; ~10 min incl. compiles)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

BATCH_PER_DOMAIN = 4
NUM_DOMAINS = 4
IMG = 256
ITERS = 20
WARMUP = 3

V5E_PEAK_BF16_TFLOPS = 197.0


def timed(fn, state, *args, iters=ITERS, warmup=WARMUP):
    """Chained timing: state' = fn(state, ...) each call."""
    s = state
    for _ in range(warmup):
        s = fn(s, *args)
    jax.block_until_ready(jax.tree_util.tree_leaves(s)[0])
    s0 = s
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s, *args)
    jax.block_until_ready(jax.tree_util.tree_leaves(s)[0])
    dt = (time.perf_counter() - t0) / iters
    del s0
    return dt * 1e3  # ms


def main():
    from mdvit_tpu.config import load_config
    from mdvit_tpu.data.augment import augment_batch
    from mdvit_tpu.data.loader import gather_batch
    from mdvit_tpu.models.registry import get_model
    from mdvit_tpu.train.optim import build_optimizer
    from mdvit_tpu.train.steps import TrainState, make_train_step

    dtype = jnp.bfloat16
    model = get_model("MDViT", img_size=IMG, num_domains=NUM_DOMAINS,
                      adapt_method="Sup", dtype=dtype)
    b = BATCH_PER_DOMAIN
    n_total = NUM_DOMAINS * b
    x0 = jnp.zeros((n_total, IMG, IMG, 3), jnp.float32)
    onehot = jnp.repeat(jnp.eye(NUM_DOMAINS, dtype=jnp.float32), b, 0)
    variables = jax.jit(
        lambda k: model.init({"params": k, "dropout": k}, x0, onehot,
                             train=False, aux_mode="grouped")
    )(jax.random.PRNGKey(0))
    config = load_config()
    tx = build_optimizer(config, steps_per_epoch=648)

    # host-side master copy: donated steps delete the device buffers, so each
    # fresh_state() re-uploads from host instead of aliasing deleted arrays
    host_vars = jax.device_get(variables)

    def fresh_state():
        v = jax.tree_util.tree_map(jnp.asarray, host_vars)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=v["params"],
            batch_stats=v["batch_stats"],
            opt_state=tx.init(v["params"]),
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
    idx = jnp.asarray(
        np.arange(n_total, dtype=np.int32).reshape(NUM_DOMAINS, b) % n_store
    )

    results = {}

    def report(name, ms):
        results[name] = round(ms, 2)
        print(f"{name:>12}: {ms:7.2f} ms "
              f"({n_total / (ms / 1e3):7.1f} img/s)", flush=True)

    # ---- full production step & ablations ----
    for name, kwargs in [
        ("full", dict(det_sup=True, device_augment=True)),
        ("single_bwd", dict(det_sup=False, device_augment=True)),
        ("no_aug", dict(det_sup=True, device_augment=False)),
    ]:
        step = make_train_step(model, tx, NUM_DOMAINS, alpha=0.5, mkd=True,
                               donate=True, **kwargs)
        ms = timed(lambda s, im, mk, ix: step(s, im, mk, ix)[0],
                   fresh_state(), images, masks, idx)
        report(name, ms)

    # ---- forward-only variants (chained through a dummy carry) ----
    v = jax.tree_util.tree_map(jnp.asarray, host_vars)
    params = v["params"]
    stats = v["batch_stats"]

    def fwd_factory(train, aux_mode, out_seg=True):
        @jax.jit
        def f(carry):
            xb = carry[:n_total]
            out = model.apply(
                {"params": params, "batch_stats": stats}, xb, onehot,
                train=train, aux_mode=aux_mode, out_seg=out_seg,
                **({"mutable": ["batch_stats"]} if train else {}),
                **({"rngs": {"dropout": jax.random.PRNGKey(0)}}
                   if train else {}),
            )
            out = out[0] if train else out
            seg = out["seg"]
            leaf = (seg[0] if isinstance(seg, tuple) and seg[0] is not None
                    else out["feat"])
            # feed a scalar of the output back into the carry so the loop
            # chains (prevents cross-call overlap / DCE)
            return carry + jnp.sum(leaf).astype(carry.dtype) * 1e-12

        return f

    xf = jnp.asarray(rng.rand(n_total, IMG, IMG, 3).astype(np.float32))
    report("fwd_train", timed(fwd_factory(True, "grouped"), xf))
    report("fwd_eval", timed(fwd_factory(False, "select"), xf))
    report("no_debranch", timed(fwd_factory(True, "none"), xf))
    report("encoder", timed(fwd_factory(False, "none", out_seg=False), xf))

    # ---- augment only ----
    @jax.jit
    def aug_only(carry, ix):
        xb, mb, oh = gather_batch(images, masks, ix)
        xa, ya = augment_batch(jax.random.PRNGKey(0), xb, mb)
        return carry + jnp.sum(xa) * 1e-12 + jnp.sum(ya) * 1e-12

    report("augment", timed(aug_only, jnp.zeros(()), idx))

    # ---- optimizer only ----
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    opt_state0 = tx.init(params)

    @jax.jit
    def opt_only(carry):
        p, o = carry
        import optax

        up, o2 = tx.update(grads, o, p)
        return (optax.apply_updates(p, up), o2)

    report("optimizer", timed(opt_only, (params, opt_state0)))

    # ---- MFU ----
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    # FLOP estimate from XLA's own cost analysis of the full step
    step = make_train_step(model, tx, NUM_DOMAINS, alpha=0.5, mkd=True,
                           det_sup=True, device_augment=True, donate=False)
    try:
        comp = jax.jit(step).lower(fresh_state(), images, masks, idx).compile()
        flops = comp.cost_analysis()["flops"]
    except Exception as e:
        print(f"cost_analysis unavailable: {e}")
        flops = float("nan")
    full_ms = results["full"]
    tflops = flops / (full_ms * 1e-3) / 1e12
    mfu = tflops / V5E_PEAK_BF16_TFLOPS
    print(f"\nparams: {n_params / 1e6:.2f}M | step flops (XLA): "
          f"{flops / 1e9:.1f} GF | achieved {tflops:.1f} TF/s | "
          f"MFU {mfu * 100:.1f}% of {V5E_PEAK_BF16_TFLOPS} TF/s bf16 peak")
    results["mfu_pct"] = round(mfu * 100, 1)
    results["step_gflops"] = round(flops / 1e9, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
