"""Jitted train/eval steps, including the MKD masked double-gradient.

The reference's staged backward (``multi_train_MDViT.py:195-213``):

1. freeze every param whose name contains ``domain_layer``,
   ``multi_aux_loss.backward(retain_graph=True)``;
2. unfreeze, ``(α·multi_kt + (1−α)·multi_seg).backward()``;
3. one optimizer step on the accumulated grads.

Freezing a *leaf* parameter in torch only stops gradient accumulation into
that leaf (activations still flow), so the exact functional semantics are:

  grad[p] = ∂(L_aux + L_uni)/∂p   for p ∉ domain_layer
  grad[p] = ∂(L_uni)/∂p           for p ∈ domain_layer

Implemented with ONE forward and TWO vjp pulls (cotangents (1,1) and (0,1))
— the same 1-forward/2-backward cost as the reference — then a parameter-path
mask selects which pull feeds each leaf.

Loss accounting parity: the reference computes each loss per domain (mean/
global sums over that domain's minibatch of B) and SUMS over domains
(``:151-194``); we reshape the stacked (D·B) batch into D groups and vmap the
per-domain losses.
"""
from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mdvit_tpu.data.augment import augment_batch, eval_transform
from mdvit_tpu.data.loader import gather_batch
from mdvit_tpu.parallel.mesh import constrain_batch
from mdvit_tpu.train.losses import bce_with_logits, dice_loss, structure_loss


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array


def path_contains(path, needle: str) -> bool:
    for p in path:
        key = getattr(p, "key", None) or getattr(p, "name", None) or str(p)
        if needle in str(key):
            return True
    return False


def _dice_iou(probs, y):
    """Thresholded (0.5) dice/jaccard of one domain's minibatch — medpy
    dc/jc definitions with empty-set guards (``multi_train_MDViT.py:171-179``).
    Shared by the MDViT/BASE and TransFuse train-step branches."""
    pred = (probs > 0.5).astype(jnp.float32)
    inter = jnp.sum(pred * y)
    sp, st = jnp.sum(pred), jnp.sum(y)
    dice = jnp.where(sp + st > 0, 2 * inter / jnp.maximum(sp + st, 1), 0.0)
    iou = jnp.where(
        sp + st - inter > 0, inter / jnp.maximum(sp + st - inter, 1), 0.0
    )
    return dice, iou


def _per_domain_losses(logits, aux_logits, labels, num_domains: int):
    """Per-domain (seg, aux, kt) losses + per-domain (dice, iou) metrics.

    Inputs are domain-contiguous (D·B, H, W, 1); each domain's loss uses only
    its own group, exactly like the reference's per-domain forwards.
    """
    d = num_domains

    def group(a):
        return a.reshape((d, -1) + a.shape[1:])

    lg, ag, yg = group(logits), group(aux_logits), group(labels)

    def one_domain(lgt, agt, y):
        probs = jax.nn.sigmoid(lgt.astype(jnp.float32))
        aux_probs = jax.nn.sigmoid(agt.astype(jnp.float32))
        seg = bce_with_logits(lgt, y) + dice_loss(probs, y)
        aux = bce_with_logits(agt, y) + dice_loss(aux_probs, y)
        kt = dice_loss(aux_probs, probs)  # KT_loss(aux_out, output) (:168)
        dice, iou = _dice_iou(probs, y)
        return seg, aux, kt, dice, iou

    seg, aux, kt, dice, iou = jax.vmap(one_domain)(lg, ag, yg)
    return seg, aux, kt, dice, iou


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    num_domains: int,
    alpha: float = 0.5,
    det_sup: bool = True,
    mkd: bool = True,
    device_augment: bool = True,
    donate: bool = True,
    data_sharding=None,
    remat: bool = False,
    compiler_options: dict | None = None,
) -> Callable:
    """Build the jitted multi-domain train step.

    Signature: ``step(state, images_tuple, masks_tuple, indices) ->
    (state, metrics)`` where images/masks are the device-resident per-domain
    uint8 stores and ``indices`` is (D, B) int32.

    ``remat=True`` (config ``tpu.remat``) wraps the model forward in
    ``jax.checkpoint``: activations are recomputed during the backward
    instead of stored — ~⅓ more FLOPs for a large activation-memory cut
    (useful for bigger images/batches than the reference recipe).

    ``compiler_options`` forwards per-computation XLA overrides to the jit
    (config ``tpu.xla_options``; the Trainer passes it only on TPU backends
    — the CPU compiler rejects TPU flag names). Production default:
    ``xla_tpu_scoped_vmem_limit_kib=24576`` — measured +2% on the reference
    recipe (369/367/372 vs 358-366 img/s default; 64 MiB is a measured
    LOSS at 345).
    """

    def step(state: TrainState, images, masks, indices):
        rng, aug_rng, drop_rng = jax.random.split(state.rng, 3)
        x_raw, m_raw, onehot = gather_batch(images, masks, indices)
        if device_augment:
            x, y = augment_batch(aug_rng, x_raw, m_raw)
        else:
            x, y = eval_transform(x_raw, m_raw)
        # DP: shard the stacked batch over the mesh's data axis; GSPMD
        # inserts the grad/BN-stat psums over ICI automatically
        x = constrain_batch(x, data_sharding)
        y = constrain_batch(y, data_sharding)
        onehot = constrain_batch(onehot, data_sharding)

        aux_sharding = None
        if data_sharding is not None and mkd:
            from jax.sharding import NamedSharding, PartitionSpec

            aux_sharding = NamedSharding(
                data_sharding.mesh, PartitionSpec(None, *data_sharding.spec)
            )

        def forward(params, batch_stats, xv, oh, dr):
            kwargs = {"aux_mode": "grouped"} if mkd else {}
            if aux_sharding is not None:
                kwargs["aux_sharding"] = aux_sharding
            return model.apply(
                {"params": params, "batch_stats": batch_stats},
                xv, oh, train=True, mutable=["batch_stats"],
                rngs={"dropout": dr}, **kwargs,
            )

        if remat:
            forward = jax.checkpoint(forward)

        def loss_fn(params):
            out, updates = forward(params, state.batch_stats, x, onehot,
                                   drop_rng)
            seg_out = out["seg"]
            if isinstance(seg_out, tuple) and len(seg_out) == 3:
                # TransFuse deep supervision: 0.5·L(map_2)+0.3·L(map_1)+
                # 0.2·L(map_x), structure_loss per domain, summed over domains
                # (multi_train_TransFuse.py:164-172)
                map_x, map_1, map_2 = seg_out

                def group(a):
                    return a.reshape((num_domains, -1) + a.shape[1:])

                def dom_loss(mx, m1, m2, yy):
                    return (0.5 * structure_loss(m2, yy)
                            + 0.3 * structure_loss(m1, yy)
                            + 0.2 * structure_loss(mx, yy))

                losses_d = jax.vmap(dom_loss)(
                    group(map_x), group(map_1), group(map_2), group(y))
                probs = jax.nn.sigmoid(group(map_2).astype(jnp.float32))
                dice_d, iou_d = jax.vmap(_dice_iou)(probs, group(y))
                multi = jnp.sum(losses_d)
                metrics = {"loss": multi, "loss_per_domain": losses_d,
                           "dice_per_domain": dice_d,
                           "iou_per_domain": iou_d}
                return (jnp.zeros(()), multi), (updates["batch_stats"],
                                                metrics)
            if isinstance(seg_out, tuple):
                logits, aux_logits = seg_out
            else:
                logits, aux_logits = seg_out, None
            if mkd:
                seg_d, aux_d, kt_d, dice_d, iou_d = _per_domain_losses(
                    logits, aux_logits, y, num_domains
                )
                multi_seg = jnp.sum(seg_d)
                multi_aux = jnp.sum(aux_d)
                multi_kt = jnp.sum(kt_d)
                uni = alpha * multi_kt + (1.0 - alpha) * multi_seg
                metrics = {
                    "loss": multi_seg, "aux_loss": multi_aux,
                    "kt_loss": multi_kt,
                    "loss_per_domain": seg_d,
                    "aux_loss_per_domain": aux_d,
                    "kt_loss_per_domain": kt_d,
                    "dice_per_domain": dice_d, "iou_per_domain": iou_d,
                }
                return (multi_aux, uni), (updates["batch_stats"], metrics)
            # BASE-style single objective (multi_train_BASE.py:196-200)
            seg_d, _, _, dice_d, iou_d = _per_domain_losses(
                logits, logits, y, num_domains
            )
            multi_seg = jnp.sum(seg_d)
            metrics = {
                "loss": multi_seg, "loss_per_domain": seg_d,
                "dice_per_domain": dice_d, "iou_per_domain": iou_d,
            }
            return (jnp.zeros(()), multi_seg), (updates["batch_stats"], metrics)

        (losses_out, vjp_fn, (new_stats, metrics)) = jax.vjp(
            loss_fn, state.params, has_aux=True
        )
        del losses_out
        one = jnp.ones((), jnp.float32)
        zero = jnp.zeros((), jnp.float32)
        if mkd and det_sup:
            # NOTE(perf): batching these two pulls through jax.vmap was tried
            # and LOST 5× (308.8 → 61.0 img/s end-to-end) — the batched
            # backward convolutions lower catastrophically on TPU. Sequential
            # pulls cost ~10 ms for the second pull; same 1-fwd/2-bwd shape
            # as the reference's staged backward.
            (g_all,) = vjp_fn((one, one))
            (g_uni,) = vjp_fn((zero, one))
            grads = jax.tree_util.tree_map_with_path(
                lambda path, ga, gu: gu
                if path_contains(path, "domain_layer") else ga,
                g_all, g_uni,
            )
        elif mkd:
            (grads,) = vjp_fn((one, one))
        else:
            (grads,) = vjp_fn((zero, one))

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            rng=rng,
        )
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else (),
                   compiler_options=compiler_options)


def make_eval_step(model, mkd: bool = True, data_sharding=None,
                   from_store: bool = False,
                   compiler_options: dict | None = None) -> Callable:
    """Jitted eval step returning masked overlap counts + loss sums so the
    host can reproduce the reference's batch-weighted averages exactly
    (``multi_train_MDViT.py:273-291``), padding-safe.

    ``from_store=True`` is the production path: ``images``/``masks`` are the
    uint8 HBM-resident :class:`~mdvit_tpu.data.loader.EvalSplitStore` arrays
    and ``indices`` selects the batch — the gather and uint8→f32 cast run
    inside jit, so eval (like training) transfers no image bytes from host.
    uint8→f32 is exact, and every reduction below is masked by ``valid``, so
    the two modes return identical results (pinned by tests).

    MKD aux dispatch mirrors the reference's val loop: each batch is
    single-domain and routed to exactly ONE debranch (``mdvit.py:714-724``)
    — the model skips the stacked debranch (``aux_mode='features'``) and the
    step applies the unstacked debranch with the caller's domain-sliced
    variables (``aux_vars``), ¼ the broadcast-select work.
    """
    debranch = model.debranch_module() if mkd and hasattr(
        model, "debranch_module") else None

    def step(params, batch_stats, images, masks, onehot, valid,
             aux_vars=None, indices=None):
        if from_store:
            images = images[indices].astype(jnp.float32)
            masks = masks[indices].astype(jnp.float32)
        x, y = eval_transform(images, masks)
        # DP eval: shard the (padded, evenly divisible) batch over the
        # mesh; the masked count/loss sums become psums automatically
        x = constrain_batch(x, data_sharding)
        y = constrain_batch(y, data_sharding)
        kwargs = {}
        if mkd:
            # 'features' is the production path (the Trainer always passes
            # domain-sliced aux_vars). The 'select' fallback exists for API
            # completeness only — direct callers evaluating MIXED-domain
            # batches without pre-slicing debranch variables (the one-hot
            # select works per-example); pinned equal to the other modes by
            # tests/test_reference_parity.py, never reached from the Trainer.
            kwargs["aux_mode"] = (
                "features" if debranch is not None and aux_vars is not None
                else "select")
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, onehot, train=False, **kwargs,
        )
        seg_out = out["seg"]
        if isinstance(seg_out, tuple) and len(seg_out) == 3:
            # TransFuse eval uses map_2 only (multi_train_TransFuse.py:240-243)
            logits, aux_logits = seg_out[2], None
        elif isinstance(seg_out, tuple):
            logits, aux_logits = seg_out
        else:
            logits, aux_logits = seg_out, None
        if mkd and aux_logits is None and "aux_features" in out:
            aux_logits = debranch.apply(
                aux_vars, out["aux_features"], None, False
            )

        b = x.shape[0]
        sample_mask = (
            jax.lax.broadcasted_iota(jnp.int32, (b, 1, 1, 1), 0) < valid
        ).astype(jnp.float32)

        def masked_counts(lg):
            probs = jax.nn.sigmoid(lg.astype(jnp.float32)) * sample_mask
            pred = (probs > 0.5).astype(jnp.float32)
            yv = y * sample_mask
            return {
                "inter": jnp.sum(pred * yv),
                "sum_pred": jnp.sum(pred),
                "sum_true": jnp.sum(yv),
            }

        # loss math in float32 regardless of model dtype, like
        # losses.bce_with_logits — keeps bf16 runs' val losses at the fp32
        # torch-parity values
        lg32 = logits.astype(jnp.float32)
        probs = jax.nn.sigmoid(lg32)
        # masked BCE mean + masked squared-denominator dice over valid samples
        n_valid_elems = valid * y.shape[1] * y.shape[2] * y.shape[3]
        per_bce = (
            jnp.maximum(lg32, 0.0) - lg32 * y
            + jnp.log1p(jnp.exp(-jnp.abs(lg32)))
        ) * sample_mask
        bce = jnp.sum(per_bce) / jnp.maximum(n_valid_elems, 1)
        pm, ym = probs * sample_mask, y * sample_mask
        smooth = 1e-5
        dice_l = 1.0 - (2 * jnp.sum(pm * ym) + smooth) / (
            jnp.sum(pm * pm) + jnp.sum(ym * ym) + smooth
        )
        res = {"loss": bce + dice_l, "primary": masked_counts(logits)}
        if mkd:
            res["aux"] = masked_counts(aux_logits)
        return res

    return jax.jit(step, compiler_options=compiler_options)


def counts_to_metrics(c: dict) -> tuple[float, float]:
    inter, sp, st = float(c["inter"]), float(c["sum_pred"]), float(c["sum_true"])
    dice = 2 * inter / (sp + st) if sp + st > 0 else 0.0
    union = sp + st - inter
    iou = inter / union if union > 0 else 0.0
    return dice, iou
