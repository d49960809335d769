"""On-device segmentation metrics.

The reference computes Dice/Jaccard by syncing every batch to host numpy and
calling ``medpy.metric.binary.dc/jc`` on the thresholded sigmoid
(``multi_train_MDViT.py:171-179``) — a device→host stall per domain per step.
Here the same quantities are computed in jnp on device; values are validated
against a literal-definition numpy implementation in tests
(``tests/test_losses_metrics.py``).

Semantics match medpy on a whole batch array: global (not per-image) binary
overlap; ``dc`` returns 0 when both masks are empty, ``jc`` returns 0 when the
union is empty.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _counts(pred: jax.Array, target: jax.Array):
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    inter = jnp.sum(pred * target)
    size_pred = jnp.sum(pred)
    size_target = jnp.sum(target)
    return inter, size_pred, size_target


def dice_coef(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Binary Dice over the whole array (medpy ``dc`` parity)."""
    inter, sp, st = _counts(pred, target)
    denom = sp + st
    return jnp.where(denom > 0, 2.0 * inter / jnp.maximum(denom, 1.0), 0.0)


def jaccard(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Binary Jaccard/IoU over the whole array (medpy ``jc`` parity)."""
    inter, sp, st = _counts(pred, target)
    union = sp + st - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)


def dice_per_image(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Per-image dice over a batch ``(B, ...)`` (reference
    ``Utils/pieces.dice_per_img:103``). Returns ``(B,)``."""
    b = pred.shape[0]
    p = pred.reshape(b, -1).astype(jnp.float32)
    t = target.reshape(b, -1).astype(jnp.float32)
    inter = jnp.sum(p * t, axis=1)
    denom = jnp.sum(p, axis=1) + jnp.sum(t, axis=1)
    return jnp.where(denom > 0, 2.0 * inter / jnp.maximum(denom, 1.0), 0.0)


def seg_metrics(probs: jax.Array, target: jax.Array, threshold: float = 0.5):
    """Dice and IoU of thresholded probabilities, as a dict of scalars."""
    pred = (probs > threshold).astype(jnp.float32)
    return {
        "dice": dice_coef(pred, target),
        "iou": jaccard(pred, target),
    }
