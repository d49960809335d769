"""Segmentation losses, numerically matching the reference.

Reference sources:
* ``dice_loss`` — squared-denominator soft dice, smooth 1e-5, global sums over
  the whole batch (``Utils/losses.py:8-16``).
* BCE on *probabilities* (``nn.BCELoss`` applied after an explicit sigmoid,
  ``multi_train_MDViT.py:76,148``). We provide both the prob-space form (exact
  parity incl. torch's log clamp at -100) and a fused logit-space form
  (identical value in exact arithmetic, numerically stable in bf16).
* ``structure_loss`` — boundary-weighted BCE-with-logits + weighted IoU
  (``multi_train_TransFuse.py:27-38``).
* ``dice_loss1`` (non-squared denom), ``iou_loss`` (``Utils/losses.py:20-46``).

All functions are pure jnp and safe under jit/grad; reductions are global
(whole-array), matching the reference's torch.sum semantics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_SMOOTH = 1e-5


def dice_loss(score: jax.Array, target: jax.Array) -> jax.Array:
    """Soft dice with squared denominator: 1 - (2·Σpt + s)/(Σp² + Σt² + s)."""
    score = score.astype(jnp.float32)
    target = target.astype(jnp.float32)
    intersect = jnp.sum(score * target)
    y_sum = jnp.sum(target * target)
    z_sum = jnp.sum(score * score)
    return 1.0 - (2.0 * intersect + _SMOOTH) / (z_sum + y_sum + _SMOOTH)


def dice_loss_nonsquared(score: jax.Array, target: jax.Array) -> jax.Array:
    """Non-squared-denominator dice (reference ``dice_loss1``)."""
    score = score.astype(jnp.float32)
    target = target.astype(jnp.float32)
    intersect = jnp.sum(score * target)
    return 1.0 - (2.0 * intersect + _SMOOTH) / (
        jnp.sum(score) + jnp.sum(target) + _SMOOTH
    )


def iou_loss(score: jax.Array, target: jax.Array) -> jax.Array:
    """Soft IoU loss (reference ``Utils/losses.py:33-46``)."""
    score = score.astype(jnp.float32)
    target = target.astype(jnp.float32)
    intersect = jnp.sum(score * target)
    union = jnp.sum(score * score) + jnp.sum(target * target) - intersect
    return 1.0 - (intersect + _SMOOTH) / (union + _SMOOTH)


def bce_loss(probs: jax.Array, target: jax.Array) -> jax.Array:
    """Mean binary cross-entropy on probabilities.

    Parity with ``torch.nn.BCELoss``: log terms are clamped at -100 so
    probs exactly 0/1 don't produce inf.
    """
    probs = probs.astype(jnp.float32)
    target = target.astype(jnp.float32)
    log_p = jnp.maximum(jnp.log(probs), -100.0)
    log_1p = jnp.maximum(jnp.log1p(-probs), -100.0)
    return -jnp.mean(target * log_p + (1.0 - target) * log_1p)


def bce_with_logits(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Mean BCE computed stably from logits.

    Same value as ``bce_loss(sigmoid(logits), target)`` in exact arithmetic:
    softplus(x) - x·t, computed as max(x,0) - x·t + log1p(exp(-|x|)).
    """
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.float32)
    per = (
        jnp.maximum(logits, 0.0)
        - logits * target
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return jnp.mean(per)


def seg_loss_from_logits(logits: jax.Array, target: jax.Array) -> jax.Array:
    """BCE + squared-denominator dice — the reference's training criterion
    (``criterion = [nn.BCELoss(), dice_loss]``, both on sigmoided outputs)."""
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    return bce_with_logits(logits, target) + dice_loss(probs, target)


def structure_loss(logits: jax.Array, mask: jax.Array) -> jax.Array:
    """TransFuse deep-supervision loss (``multi_train_TransFuse.py:27-38``).

    ``weit = 1 + 5·|avgpool31(mask) − mask|`` emphasises boundaries; combines
    per-image weighted BCE-with-logits and weighted IoU, then means over batch.

    Args are NHWC: logits/mask ``(B, H, W, 1)``.
    """
    logits = logits.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    # 31x31 average pool, stride 1, pad 15 (count includes padding zeros,
    # matching torch's default count_include_pad=True)
    pooled = jax.lax.reduce_window(
        mask,
        0.0,
        jax.lax.add,
        window_dimensions=(1, 31, 31, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (15, 15), (15, 15), (0, 0)),
    ) / (31.0 * 31.0)
    weit = 1.0 + 5.0 * jnp.abs(pooled - mask)

    per_bce = (
        jnp.maximum(logits, 0.0)
        - logits * mask
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    axes = (1, 2, 3)
    wbce = jnp.sum(weit * per_bce, axis=axes) / jnp.sum(weit, axis=axes)

    pred = jax.nn.sigmoid(logits)
    inter = jnp.sum(pred * mask * weit, axis=axes)
    union = jnp.sum((pred + mask) * weit, axis=axes)
    wiou = 1.0 - (inter + 1.0) / (union - inter + 1.0)
    return jnp.mean(wbce + wiou)


def entropy_loss(probs: jax.Array, c: int = 2) -> jax.Array:
    """Mean entropy of binary probabilities (reference ``Utils/losses.py``)."""
    probs = probs.astype(jnp.float32)
    ent = -(
        probs * jnp.log(probs + 1e-6)
        + (1.0 - probs) * jnp.log(1.0 - probs + 1e-6)
    )
    return jnp.mean(ent) / jnp.log(jnp.asarray(float(c)))
