#!/usr/bin/env python
"""Benchmark: images/sec/chip for the full 4-domain MDViT train step.

Measures the flagship configuration end-to-end as trained (reference recipe:
256², batch 4/domain → 16 images/step, Sup adapters, MKD double-backward,
AdamW update, on-device augmentation) on one chip.

``vs_baseline`` compares against an A100 estimate for the PyTorch reference,
since the reference repo publishes no numbers (BASELINE.md): the reference
runs 4 sequential fp32/TF32 forwards + a double backward over a ~35M-param
model at 256² (~50 GFLOP/img forward, ~150 GFLOP/img train step); at the
20-30% utilization typical of small-batch research PyTorch on A100 (TF32,
≈156 TFLOP/s peak) that is ≈200-300 img/s. We pin the baseline at the
optimistic end, 300 img/s, so vs_baseline is conservative.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_BASELINE_IMG_PER_SEC = 300.0
# attainable single-chip ceiling: the fusion-boundary HBM floor of the train
# step at 819 GB/s peak (scripts/hbm_floor.py, results/hbm_floor.json;
# README §"The analytic HBM floor and the throughput ceiling")
ANALYTIC_FLOOR_IMG_PER_SEC = 432.7
BATCH_PER_DOMAIN = 4
NUM_DOMAINS = 4
IMG = 256
WARMUP = 5
ITERS = 30
# v5e datasheet: 197 TFLOP/s bf16, 819 GB/s HBM
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_GBPS = 819.0


def main():
    from mdvit_tpu.config import load_config
    from mdvit_tpu.models.registry import get_model
    from mdvit_tpu.train.optim import build_optimizer
    from mdvit_tpu.train.steps import TrainState, make_train_step

    import os

    dtype = (
        jnp.bfloat16
        if os.environ.get("MDVIT_BENCH_DTYPE", "bf16") == "bf16"
        else jnp.float32
    )
    model = get_model("MDViT", img_size=IMG, num_domains=NUM_DOMAINS,
                      adapt_method="Sup", dtype=dtype)
    b = BATCH_PER_DOMAIN
    x = jnp.zeros((NUM_DOMAINS * b, IMG, IMG, 3), jnp.float32)
    onehot = jnp.repeat(jnp.eye(NUM_DOMAINS, dtype=jnp.float32), b, 0)
    variables = jax.jit(
        lambda k: model.init({"params": k, "dropout": k}, x, onehot,
                             train=False, aux_mode="grouped")
    )(jax.random.PRNGKey(0))

    config = load_config()
    tx = build_optimizer(config, steps_per_epoch=648)  # ref: 2594//4
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        rng=jax.random.PRNGKey(1),
    )

    # synthetic device-resident stores sized like the real domains
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

    step = make_train_step(model, tx, NUM_DOMAINS, alpha=0.5, det_sup=True,
                           mkd=True, device_augment=True, donate=True)

    def idx(i):
        return jnp.asarray(
            (np.arange(NUM_DOMAINS * b, dtype=np.int32) * (i + 1)) % n_store
        ).reshape(NUM_DOMAINS, b)

    # compile once via AOT so XLA's cost analysis (flops / bytes accessed)
    # can be read off the same executable that is timed
    run = step
    flops = bytes_acc = None
    # XLA compiler options: the production default matches the Trainer's
    # tpu.xla_options (24 MiB scoped vmem — measured +2%, see README §floor);
    # the MDVIT_BENCH_XLA_OPTS="k=v,k=v" knob REPLACES it for experiments
    # (e.g. xla_tpu_scoped_vmem_limit_kib=65536), and experiment keys fail
    # LOUDLY instead of silently measuring the default-compiled path
    opts_env = os.environ.get("MDVIT_BENCH_XLA_OPTS")
    if opts_env:
        compiler_options = dict(kv.split("=", 1) for kv in opts_env.split(","))
    else:
        compiler_options = dict(config.tpu.get("xla_options") or {})
    try:
        lowered = step.lower(state, images, masks, idx(0))
        try:
            compiled = lowered.compile(compiler_options=compiler_options or None)
        except Exception:
            if opts_env:
                raise  # experiment run must not silently measure the default
            # production options not supported here (e.g. non-TPU backend):
            # fall back to the default compile
            compiled = lowered.compile()
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0)) or None
            bytes_acc = float(ca.get("bytes accessed", 0)) or None
        except Exception:
            pass
        run = compiled
    except Exception:
        if opts_env:
            raise  # an experiment run must not silently measure the default
        run = step  # fall back to the jit dispatch path
    # first execution happens OUTSIDE the try: the step donates `state`, so
    # falling back to the jit path after a failed *execution* would dispatch
    # on already-deleted buffers

    for i in range(WARMUP):
        state, metrics = run(state, images, masks, idx(i))
    jax.block_until_ready(state.params)

    # the tunnel very occasionally returns from block_until_ready without
    # having executed (observed: a "2853 img/s, MFU 1.33" reading — >2× the
    # analytic unique-read floor, physically impossible); retry the timed
    # loop rather than record a glitch
    for attempt in range(3):
        t0 = time.perf_counter()
        for i in range(ITERS):
            state, metrics = run(state, images, masks, idx(i))
        jax.block_until_ready(state.params)
        dt = time.perf_counter() - t0
        if NUM_DOMAINS * b * ITERS / dt < 800.0:  # sane: proven floor is 433
            break

    # optional device-profile capture of 10 extra steps (does not perturb
    # the timed loop above); roll up with scripts/parse_xplane.py
    prof_dir = os.environ.get("MDVIT_BENCH_PROFILE")
    if prof_dir:
        with jax.profiler.trace(prof_dir):
            for i in range(10):
                state, metrics = run(state, images, masks, idx(i))
            jax.block_until_ready(state.params)

    imgs_per_sec = NUM_DOMAINS * b * ITERS / dt
    out = {
        "metric": "mdvit_4domain_256_train_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "img/s",
        # vs_baseline = ratio to 1x the (optimistic) A100 estimate below;
        # BASELINE.json's north-star target is 5x that estimate, reported
        # separately as vs_target_5x so the recorded line is self-describing.
        "vs_baseline": round(imgs_per_sec / A100_BASELINE_IMG_PER_SEC, 3),
        "a100_estimate": A100_BASELINE_IMG_PER_SEC,
        "vs_target_5x": round(
            imgs_per_sec / (5.0 * A100_BASELINE_IMG_PER_SEC), 3),
        # fraction of the attainable single-chip ceiling (the analytic
        # fusion-boundary HBM floor at peak bandwidth)
        "analytic_floor_img_per_sec": ANALYTIC_FLOOR_IMG_PER_SEC,
        "pct_of_floor": round(
            100.0 * imgs_per_sec / ANALYTIC_FLOOR_IMG_PER_SEC, 1),
    }
    if imgs_per_sec >= 800.0:
        # all retries impossible — mark the artifact untrustworthy rather
        # than let a tunnel glitch masquerade as a speedup
        out["suspect_tunnel_glitch"] = True
    step_s = dt / ITERS
    if flops:
        # model-flops utilization vs the v5e bf16 peak (XLA-counted flops
        # include the augment/optimizer tail, so this is an upper-ish bound)
        out["mfu"] = round(flops / step_s / PEAK_BF16_FLOPS, 4)
        out["gflops_per_img"] = round(flops / (NUM_DOMAINS * b) / 1e9, 1)
    if bytes_acc:
        # XLA's analytic per-op operand+output byte count: an UPPER BOUND on
        # HBM traffic that ignores fusion reuse, so the utilization ratio can
        # exceed 1.0 of peak — named "analytic" to keep the JSON physically
        # interpretable. The measured effective figure is ~2.7 GB/img
        # (README §Performance batch-scaling measurement).
        out["analytic_gbytes_per_img"] = round(
            bytes_acc / (NUM_DOMAINS * b) / 1e9, 3)
        out["analytic_bytes_util"] = round(
            bytes_acc / step_s / 1e9 / PEAK_HBM_GBPS, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
