#!/usr/bin/env python
"""Analytic HBM-traffic floor for the production MDViT train step.

Answers the question the rejected-optimization history raises inductively:
is the measured step time a *ceiling*? The step is bandwidth-bound (README
§Performance: batch-scaling flat, chip 97% busy), so the floor on step time
is floor_bytes / peak_HBM_bandwidth. This script derives floor_bytes from
the train step's OWN jaxpr — no XLA schedule involved:

* Every ``dot_general`` / ``conv_general_dilated`` / ``gather`` must stream
  its operands from HBM and its outputs to HBM (MXU/VPU kernels cannot keep
  multi-MB tensors resident in 128 MB VMEM across kernels at these sizes —
  stage-0 activations alone are 2 MB/img).
* ALL other primitives (elementwise chains, reductions, layernorm/BN moment
  math, softmax, transposes/reshapes/layout copies) are assumed to fuse
  PERFECTLY into their producers/consumers — zero bytes. This is strictly
  optimistic: the real XLA schedule materializes many of them (the measured
  device profile shows 38% of time in elementwise/reduce fusions and 16% in
  layout copies).
* The optimizer update is counted analytically (it is elementwise but its
  param-sized fp32 reads/writes of p/m/v cannot fuse into the backward
  matmuls that produce scattered grad leaves): read g+p+m+v, write p+m+v.

Three totals are reported:

* ``floor_unique``: every distinct tensor is written once and read at most
  once no matter how many consumers (the unattainable ideal — e.g. one
  fused kernel computing Q,K,V reading x once);
* ``floor_per_consumer``: a tensor consumed by k materializing ops is read
  k times (what distinct kernels must do), elementwise still free;
* ``floor_fusion_boundary``: the *attainable* floor — simulates XLA:TPU's
  actual fusion constraint. Matmul/conv/gather lower to custom-calls that
  cannot host arbitrary elementwise prologues/epilogues, so the jaxpr is
  partitioned into kernels (each materializing op alone; maximal connected
  components of everything else fuse perfectly), and each kernel pays HBM
  reads for inputs produced outside it and writes for outputs consumed
  outside it. This charges exactly the traffic the device profile observes
  as "elementwise/reduce fusions" and "layout copies" — the bridge
  materializations between custom-calls — while still assuming XLA fuses
  every chain maximally (it empirically does: every hand-fusion attempt
  lost, README rejected list).

Usage (CPU is fine — tracing only, no compile):
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/hbm_floor.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.extend  # jax.extend.core is not loaded by `import jax` alone
import jax.numpy as jnp
import numpy as np

BATCH_PER_DOMAIN = 4
NUM_DOMAINS = 4
IMG = 256
PEAK_HBM_GBPS = 819.0

MATERIALIZING = {"dot_general", "conv_general_dilated", "gather"}
# unary ops through which the "this is a parameter" tag propagates
PASSTHROUGH = {"convert_element_type", "reshape", "transpose",
               "broadcast_in_dim", "squeeze", "copy"}


def build_step_and_args():
    from mdvit_tpu.config import load_config
    from mdvit_tpu.models.registry import get_model
    from mdvit_tpu.train.optim import build_optimizer
    from mdvit_tpu.train.steps import TrainState, make_train_step

    model = get_model("MDViT", img_size=IMG, num_domains=NUM_DOMAINS,
                      adapt_method="Sup", dtype=jnp.bfloat16)
    b = BATCH_PER_DOMAIN
    x = jnp.zeros((NUM_DOMAINS * b, IMG, IMG, 3), jnp.float32)
    onehot = jnp.repeat(jnp.eye(NUM_DOMAINS, dtype=jnp.float32), b, 0)
    variables = jax.eval_shape(
        lambda k: model.init({"params": k, "dropout": k}, x, onehot,
                             train=False, aux_mode="grouped"),
        jax.random.PRNGKey(0),
    )
    # ShapeDtypeStructs are enough for make_jaxpr
    config = load_config()
    tx = build_optimizer(config, steps_per_epoch=648)
    params = variables["params"]
    opt_state = jax.eval_shape(tx.init, params)
    state = TrainState(
        step=jax.ShapeDtypeStruct((), jnp.int32),
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=opt_state,
        rng=jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    n_store = 64
    images = tuple(
        jax.ShapeDtypeStruct((n_store, IMG, IMG, 3), jnp.uint8)
        for _ in range(NUM_DOMAINS)
    )
    masks = tuple(
        jax.ShapeDtypeStruct((n_store, IMG, IMG), jnp.uint8)
        for _ in range(NUM_DOMAINS)
    )
    idx = jax.ShapeDtypeStruct((NUM_DOMAINS, b), jnp.int32)
    step = make_train_step(model, tx, NUM_DOMAINS, alpha=0.5, det_sup=True,
                           mkd=True, device_augment=True, donate=False)
    return step, state, images, masks, idx


def _nbytes(aval) -> int:
    try:
        return int(np.prod(aval.shape)) * aval.dtype.itemsize
    except Exception:
        return 0


def _sub_jaxprs(eqn):
    out = []
    for v in eqn.params.values():
        if isinstance(v, jax.extend.core.ClosedJaxpr):
            out.append(v.jaxpr)
        elif isinstance(v, jax.extend.core.Jaxpr):
            out.append(v)
        elif isinstance(v, (tuple, list)):
            for item in v:
                if isinstance(item, jax.extend.core.ClosedJaxpr):
                    out.append(item.jaxpr)
                elif isinstance(item, jax.extend.core.Jaxpr):
                    out.append(item)
    return out


def analyze(jaxpr, param_tagged: set):
    """Walk one (flat-recursive) jaxpr; return per-category byte tallies.

    ``param_tagged`` is the set of var ids (outer invars) holding parameter /
    optimizer-state tensors, propagated through PASSTHROUGH ops so a bf16
    cast of a weight still counts as parameter traffic.
    """
    stats = {
        "matmul_param_read": 0, "matmul_act_read": 0, "matmul_out_write": 0,
        "conv_param_read": 0, "conv_act_read": 0, "conv_out_write": 0,
        "gather_read": 0, "gather_write": 0,
        "n_matmul": 0, "n_conv": 0, "n_gather": 0,
    }
    unique_read_ids = set()
    unique_bytes = {"written": 0, "read": 0}
    per_consumer_reads = 0

    def walk(jx, tagged):
        nonlocal per_consumer_reads
        for eqn in jx.eqns:
            subs = _sub_jaxprs(eqn)
            if subs:
                for sub in subs:
                    # map outer operand tags onto inner invars
                    inner_tagged = set()
                    for iv, ov in zip(sub.invars, eqn.invars):
                        if (not isinstance(ov, jax.extend.core.Literal)
                                and id(ov) in tagged):
                            inner_tagged.add(id(iv))
                    walk(sub, tagged | inner_tagged)
                # tags do not propagate out of calls (conservative)
                continue
            prim = eqn.primitive.name
            if prim in PASSTHROUGH and eqn.invars:
                ov = eqn.invars[0]
                if (not isinstance(ov, jax.extend.core.Literal)
                        and id(ov) in tagged):
                    tagged.add(id(eqn.outvars[0]))
                continue
            if prim not in MATERIALIZING:
                continue
            kind = ("matmul" if prim == "dot_general"
                    else "conv" if prim == "conv_general_dilated"
                    else "gather")
            stats[f"n_{kind}"] += 1
            if kind == "gather":
                # a gather reads only the gathered elements, not its whole
                # operand (the HBM-resident uint8 corpus stores would
                # otherwise dominate): read ≈ output size + indices
                out_nb = sum(_nbytes(v.aval) for v in eqn.outvars)
                idx_nb = (_nbytes(eqn.invars[1].aval)
                          if len(eqn.invars) > 1
                          and not isinstance(eqn.invars[1],
                                             jax.extend.core.Literal) else 0)
                stats["gather_read"] += out_nb + idx_nb
                per_consumer_reads += out_nb + idx_nb
                unique_bytes["read"] += out_nb + idx_nb
                stats["gather_write"] += out_nb
                unique_bytes["written"] += out_nb
                continue
            for v in eqn.invars:
                if isinstance(v, jax.extend.core.Literal):
                    continue
                nb = _nbytes(v.aval)
                per_consumer_reads += nb
                if id(v) not in unique_read_ids:
                    unique_read_ids.add(id(v))
                    unique_bytes["read"] += nb
                if id(v) in tagged:
                    stats[f"{kind}_param_read"] += nb
                else:
                    stats[f"{kind}_act_read"] += nb
            for v in eqn.outvars:
                nb = _nbytes(v.aval)
                unique_bytes["written"] += nb
                stats[f"{kind}_out_write"] += nb

    walk(jaxpr, set(param_tagged))
    stats["per_consumer_reads"] = per_consumer_reads
    stats["unique_read"] = unique_bytes["read"]
    stats["unique_written"] = unique_bytes["written"]
    return stats


def flatten_jaxpr(jaxpr):
    """Inline call-like sub-jaxprs (pjit/custom_vjp/remat) into one flat
    equation list with globally-renamed vars.

    Returns ``(eqns, avals)`` where each eqn is ``(prim_name, in_ids,
    out_ids)`` over global integer var ids and ``avals[id]`` is the var's
    aval. Sub-jaxprs whose invars don't correspond 1:1 to the call's
    operands (scan carries, cond branches — only scalar schedule math here)
    are kept opaque as a single fusible node.
    """
    eqns = []
    avals = {}
    counter = [0]

    def fresh(aval):
        counter[0] += 1
        avals[counter[0]] = aval
        return counter[0]

    def walk(jx, env):
        # env: maps id(var-in-this-scope) -> global id
        def gid(v):
            if isinstance(v, jax.extend.core.Literal):
                return None
            if id(v) not in env:
                env[id(v)] = fresh(v.aval)
            return env[id(v)]

        for eqn in jx.eqns:
            subs = _sub_jaxprs(eqn)
            if (len(subs) == 1
                    and len(subs[0].invars) == len(eqn.invars)
                    and len(subs[0].outvars) == len(eqn.outvars)):
                sub = subs[0]
                inner = {}
                for iv, ov in zip(sub.invars, eqn.invars):
                    g = gid(ov)
                    if g is not None:
                        inner[id(iv)] = g
                for cv in sub.constvars:
                    inner[id(cv)] = fresh(cv.aval)
                walk(sub, inner)
                for sov, ov in zip(sub.outvars, eqn.outvars):
                    if isinstance(sov, jax.extend.core.Literal):
                        env[id(ov)] = fresh(ov.aval)
                    else:
                        env[id(ov)] = inner.get(id(sov)) or fresh(ov.aval)
                continue
            in_ids = [gid(v) for v in eqn.invars]
            out_ids = [gid(v) for v in eqn.outvars]
            eqns.append((eqn.primitive.name,
                         [i for i in in_ids if i is not None],
                         [o for o in out_ids if o is not None]))

    top_env = {}
    for iv in list(jaxpr.invars) + list(jaxpr.constvars):
        top_env[id(iv)] = fresh(iv.aval)
    walk(jaxpr, top_env)
    out_ids = {top_env.get(id(v)) for v in jaxpr.outvars
               if not isinstance(v, jax.extend.core.Literal)}
    in_ids = {top_env[id(v)] for v in jaxpr.invars}
    return eqns, avals, in_ids, out_ids


def fusion_floor(jaxpr):
    """Partition the flat graph into kernels (materializing ops alone;
    connected non-materializing components fused) and tally each kernel's
    cross-boundary HBM reads/writes."""
    eqns, avals, top_in, top_out = flatten_jaxpr(jaxpr)

    # union-find over eqn indices
    parent = list(range(len(eqns)))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    producer = {}
    for i, (_, _, outs) in enumerate(eqns):
        for o in outs:
            producer[o] = i
    for i, (prim, ins, _) in enumerate(eqns):
        if prim in MATERIALIZING:
            continue
        for v in ins:
            j = producer.get(v)
            if j is not None and eqns[j][0] not in MATERIALIZING:
                union(i, j)

    # consumers per var (by kernel root)
    consumers = {}
    for i, (_, ins, _) in enumerate(eqns):
        for v in ins:
            consumers.setdefault(v, set()).add(find(i))

    def nb(v):
        return _nbytes(avals[v])

    # per-kernel cross-boundary input/output sets (a var read by several
    # eqns of one fused kernel is one HBM read; read by k kernels is k)
    kernel_in = {}
    kernel_out = {}
    gather_bytes = 0
    for i, (prim, ins, outs) in enumerate(eqns):
        root = find(i)
        if prim == "gather":
            # read only the gathered elements + indices, not the store
            gather_bytes += sum(nb(o) for o in outs)
            gather_bytes += nb(ins[1]) if len(ins) > 1 else 0
        else:
            for v in ins:
                j = producer.get(v)
                if j is not None and find(j) == root:
                    continue  # produced inside this kernel — stays in VMEM
                kernel_in.setdefault(root, set()).add(v)
        for o in outs:
            if (consumers.get(o, set()) - {root}) or o in top_out:
                kernel_out.setdefault(root, set()).add(o)

    read = gather_bytes + sum(
        nb(v) for vs in kernel_in.values() for v in vs)
    written = sum(nb(o) for os_ in kernel_out.values() for o in os_)
    return {"fusion_read": read, "fusion_written": written,
            "n_eqns": len(eqns),
            "n_kernels": len({find(i) for i in range(len(eqns))})}


def main():
    step, state, images, masks, idx = build_step_and_args()
    print("tracing the production train step ...", file=sys.stderr)
    closed = jax.make_jaxpr(step)(state, images, masks, idx)
    jaxpr = closed.jaxpr

    # tag the invars that are params / optimizer state (their reads are
    # parameter traffic, not activation traffic)
    flat_args, _ = jax.tree_util.tree_flatten((state, images, masks, idx))
    param_like = set(
        id(x) for x in jax.tree_util.tree_leaves((state.params,
                                                  state.opt_state)))
    tagged = {
        id(iv)
        for iv, arg in zip(jaxpr.invars, flat_args)
        if id(arg) in param_like
    }

    stats = analyze(jaxpr, tagged)

    n_img = NUM_DOMAINS * BATCH_PER_DOMAIN
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params)
    )
    # optimizer update: read grad+param+m+v, write param+m+v (fp32)
    opt_bytes = 7 * n_params * 4

    total_per_consumer = (stats["per_consumer_reads"]
                          + stats["matmul_out_write"]
                          + stats["conv_out_write"] + stats["gather_write"]
                          + opt_bytes)
    total_unique = (stats["unique_read"] + stats["unique_written"]
                    + opt_bytes)

    print("partitioning into fusion kernels ...", file=sys.stderr)
    fstats = fusion_floor(jaxpr)
    # optimizer eqns are in the jaxpr, so the fusion tier counts them itself
    total_fusion = fstats["fusion_read"] + fstats["fusion_written"]

    def per_img(b):
        return b / n_img / 1e9

    out = {
        "model_params_M": round(n_params / 1e6, 2),
        "n_matmul": stats["n_matmul"],
        "n_conv": stats["n_conv"],
        "n_gather": stats["n_gather"],
        "gb_per_img": {
            "matmul_param_read": round(per_img(stats["matmul_param_read"]), 3),
            "matmul_act_read": round(per_img(stats["matmul_act_read"]), 3),
            "matmul_out_write": round(per_img(stats["matmul_out_write"]), 3),
            "conv_param_read": round(per_img(stats["conv_param_read"]), 3),
            "conv_act_read": round(per_img(stats["conv_act_read"]), 3),
            "conv_out_write": round(per_img(stats["conv_out_write"]), 3),
            "gather": round(
                per_img(stats["gather_read"] + stats["gather_write"]), 3),
            "optimizer_analytic": round(per_img(opt_bytes), 3),
        },
        "floor_per_consumer_gb_per_img": round(per_img(total_per_consumer), 3),
        "floor_unique_gb_per_img": round(per_img(total_unique), 3),
        "floor_fusion_boundary_gb_per_img": round(per_img(total_fusion), 3),
        "fusion_kernels": fstats["n_kernels"],
        "fusion_eqns": fstats["n_eqns"],
        "floor_step_ms_at_peak_hbm": {
            "per_consumer": round(
                total_per_consumer / (PEAK_HBM_GBPS * 1e9) * 1e3, 2),
            "unique": round(total_unique / (PEAK_HBM_GBPS * 1e9) * 1e3, 2),
            "fusion_boundary": round(
                total_fusion / (PEAK_HBM_GBPS * 1e9) * 1e3, 2),
        },
        "floor_img_per_sec_at_peak_hbm": {
            "per_consumer": round(
                n_img / (total_per_consumer / (PEAK_HBM_GBPS * 1e9)), 1),
            "unique": round(
                n_img / (total_unique / (PEAK_HBM_GBPS * 1e9)), 1),
            "fusion_boundary": round(
                n_img / (total_fusion / (PEAK_HBM_GBPS * 1e9)), 1),
        },
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
