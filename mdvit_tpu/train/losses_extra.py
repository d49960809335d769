"""The reference's shipped-but-CLI-unused loss family, TPU-native.

Reference: ``Utils/losses.py:52-353`` — softmax consistency losses
(mean-teacher style), SDF (signed-distance-field) losses, and the supervised
contrastive loss. None are reachable from the reference CLIs, but they are
part of its API surface; re-implemented here for capability parity.

Design notes:
* softmax/KL/MSE losses are pure jnp, channel axis LAST (NHWC convention of
  this framework; the reference uses dim=1 on NCHW).
* The SDF ground-truth maps are inherently host-side preprocessing (the
  reference computes them under ``no_grad`` on CPU numpy per batch,
  ``Utils/losses.py:233-260``): ``compute_sdf01/_1_1/fore_dist`` are numpy
  functions (scipy EDT + a shift-based inner-boundary, replacing skimage).
  The differentiable halves (``aaai_sdf_loss``) take the precomputed SDF as a
  device array — use ``jax.pure_callback`` or the data pipeline to produce it.
* ``supervised_contrastive_loss`` is a pure function (the reference wraps it
  in an nn.Module for no reason beyond holding a temperature).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mdvit_tpu.train.losses import dice_loss_nonsquared

_SMOOTH = 1e-5


# ---------------------------------------------------------------------------
# softmax consistency losses (Utils/losses.py:52-117)
# ---------------------------------------------------------------------------


def softmax_dice_loss(input_logits: jax.Array,
                      target_logits: jax.Array) -> jax.Array:
    """Mean per-class non-squared dice between the two softmaxes
    (``Utils/losses.py:52-68``). Channel axis is LAST."""
    assert input_logits.shape == target_logits.shape
    p = jax.nn.softmax(input_logits.astype(jnp.float32), axis=-1)
    t = jax.nn.softmax(target_logits.astype(jnp.float32), axis=-1)
    n = input_logits.shape[-1]
    dice = sum(
        dice_loss_nonsquared(p[..., i], t[..., i]) for i in range(n)
    )
    return dice / n


def entropy_loss_map(p: jax.Array, c: int = 2) -> jax.Array:
    """Per-pixel entropy map over the channel axis
    (``Utils/losses.py:71-74``)."""
    p = p.astype(jnp.float32)
    ent = -jnp.sum(p * jnp.log(p + 1e-6), axis=-1, keepdims=True)
    return ent / jnp.log(jnp.asarray(float(c)))


def softmax_mse_loss(input_logits: jax.Array,
                     target_logits: jax.Array) -> jax.Array:
    """Elementwise (unreduced) MSE between softmaxes; gradients flow to the
    inputs only (``Utils/losses.py:77-89``)."""
    assert input_logits.shape == target_logits.shape
    p = jax.nn.softmax(input_logits.astype(jnp.float32), axis=-1)
    t = jax.lax.stop_gradient(
        jax.nn.softmax(target_logits.astype(jnp.float32), axis=-1)
    )
    return (p - t) ** 2


def softmax_kl_loss(input_logits: jax.Array,
                    target_logits: jax.Array) -> jax.Array:
    """Elementwise (unreduced) KL(target ‖ input) with log-softmax input,
    matching ``F.kl_div(input_log_softmax, target_softmax, reduction='none')``
    (``Utils/losses.py:92-106``)."""
    assert input_logits.shape == target_logits.shape
    log_p = jax.nn.log_softmax(input_logits.astype(jnp.float32), axis=-1)
    t = jax.lax.stop_gradient(
        jax.nn.softmax(target_logits.astype(jnp.float32), axis=-1)
    )
    # torch F.kl_div(input, target) = target * (log(target) - input)
    return t * (jnp.log(jnp.maximum(t, 1e-38)) - log_p)


def symmetric_mse_loss(input1: jax.Array, input2: jax.Array) -> jax.Array:
    """Mean squared difference, gradients to both sides
    (``Utils/losses.py:109-117``)."""
    assert input1.shape == input2.shape
    d = input1.astype(jnp.float32) - input2.astype(jnp.float32)
    return jnp.mean(d * d)


# ---------------------------------------------------------------------------
# SDF ground-truth maps — host-side numpy (Utils/losses.py:120-231)
# ---------------------------------------------------------------------------


def _edt(mask: np.ndarray) -> np.ndarray:
    """Euclidean distance transform of a binary mask (distance of each
    nonzero pixel to the nearest zero pixel) — scipy's EDT, the same
    ``distance`` the reference imports."""
    from scipy.ndimage import distance_transform_edt

    return distance_transform_edt(mask)


def _inner_boundary(posmask: np.ndarray) -> np.ndarray:
    """skimage ``find_boundaries(mode='inner')`` for a binary 2-D mask:
    object pixels 4-adjacent to background (or the array edge is NOT a
    boundary — skimage pads with the edge value)."""
    p = posmask.astype(bool)
    pad = np.pad(p, 1, mode="edge")
    nb_bg = (
        ~pad[:-2, 1:-1] | ~pad[2:, 1:-1] | ~pad[1:-1, :-2] | ~pad[1:-1, 2:]
    )
    return (p & nb_bg).astype(np.uint8)


def _per_mask(segmentation: np.ndarray, fn) -> np.ndarray:
    """Apply ``fn(posmask) -> map`` over (B, C, ...) skipping empty masks,
    honoring the reference's background-skip rule (class 0 skipped iff C>1)."""
    seg = segmentation.astype(np.uint8)
    if seg.ndim == 3:  # (B,H,W) → (B,1,H,W); (B,C,H,W) passes through
        seg = seg[:, None]
    out = np.zeros(seg.shape, np.float64)
    dis_id = 0 if seg.shape[1] == 1 else 1
    for b in range(seg.shape[0]):
        for c in range(dis_id, seg.shape[1]):
            posmask = seg[b, c]
            if posmask.max() == 0:
                continue
            out[b, c] = fn(posmask)
    return out


def compute_sdf01(segmentation: np.ndarray) -> np.ndarray:
    """Normalized SDF in [0, 1]: 0.5 at the boundary, <0.5 inside
    (``Utils/losses.py:120-155``)."""

    def one(posmask):
        negmask = 1 - posmask
        posdis = _edt(posmask)
        negdis = _edt(negmask)
        sdf = (negdis / max(negdis.max(), 1e-12) / 2
               - posdis / max(posdis.max(), 1e-12) / 2 + 0.5)
        sdf[_inner_boundary(posmask) > 0] = 0.5
        return sdf

    return _per_mask(segmentation, one)


def compute_sdf1_1(segmentation: np.ndarray) -> np.ndarray:
    """Normalized SDF in [-1, 1]: 0 at the boundary, negative inside
    (``Utils/losses.py:158-191``)."""

    def one(posmask):
        negmask = 1 - posmask
        posdis = _edt(posmask)
        negdis = _edt(negmask)
        sdf = (negdis / max(negdis.max(), 1e-12)
               - posdis / max(posdis.max(), 1e-12))
        sdf[_inner_boundary(posmask) > 0] = 0
        return sdf

    return _per_mask(segmentation, one)


def compute_fore_dist(segmentation: np.ndarray) -> np.ndarray:
    """Normalized foreground distance map (``Utils/losses.py:194-219``)."""

    def one(posmask):
        posdis = _edt(posmask)
        return posdis / max(posdis.max(), 1e-12)

    return _per_mask(segmentation, one)


# ---------------------------------------------------------------------------
# SDF losses — differentiable halves (Utils/losses.py:233-307)
# ---------------------------------------------------------------------------


def aaai_sdf_loss(net_output: jax.Array, gt_sdm: jax.Array) -> jax.Array:
    """AAAI SDF product loss + L1 (``Utils/losses.py:233-270``).

    ``gt_sdm`` is the precomputed ``compute_sdf1_1`` map of the one-hot GT
    (host-side, non-differentiable in the reference too). Shapes (B, C, ...)
    — any layout, as long as both match and axes 2+ are spatial."""
    net_output = net_output.astype(jnp.float32)
    gt_sdm = jax.lax.stop_gradient(gt_sdm.astype(jnp.float32))
    axes = tuple(range(2, net_output.ndim))
    smooth = _SMOOTH
    intersect = jnp.sum(net_output * gt_sdm, axis=axes)
    pd_sum = jnp.sum(net_output * net_output, axis=axes)
    gt_sum = jnp.sum(gt_sdm * gt_sdm, axis=axes)
    l_product = (intersect + smooth) / (intersect + pd_sum + gt_sum)
    l1 = jnp.sum(jnp.abs(net_output - gt_sdm)) / net_output.size
    return -jnp.mean(l_product) + l1


def sdf_kl_loss(net_output: jax.Array, gt_sdf: jax.Array) -> jax.Array:
    """KL against the (smoothed) SDF of the foreground class
    (``Utils/losses.py:273-307``): ``F.kl_div(net_output, gt_sdf[:, 1:2],
    reduction='batchmean')`` with ``net_output`` already log-space."""
    net_output = net_output.astype(jnp.float32)
    gt = jax.lax.stop_gradient(gt_sdf.astype(jnp.float32) + _SMOOTH)
    tgt = gt[:, 1:2]
    kl = tgt * (jnp.log(jnp.maximum(tgt, 1e-38)) - net_output)
    return jnp.sum(kl) / net_output.shape[0]


# ---------------------------------------------------------------------------
# Supervised contrastive loss (Utils/losses.py:310-353)
# ---------------------------------------------------------------------------


def supervised_contrastive_loss(
    projections: jax.Array,
    targets: jax.Array,
    attribute: jax.Array | None = None,
    temperature: float = 0.1,
) -> jax.Array:
    """SupCon over a batch of projection vectors, reductions matching the
    reference exactly (``Utils/losses.py:321-353``): cosine similarity / T,
    row-max-stabilized exp (+1e-5 after exp), positives = same target
    excluding self (optionally denominator restricted to matching
    ``attribute``), and a GLOBAL sum(log_prob·mask)/sum(cardinality)+1e-5."""
    z = projections.astype(jnp.float32)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=1, keepdims=True), 1e-12)
    sim = (z @ z.T) / temperature
    exp_sim = jnp.exp(sim - jnp.max(sim, axis=1, keepdims=True)) + 1e-5
    n = z.shape[0]
    same = targets[:, None] == targets[None, :]
    eye = jnp.eye(n, dtype=bool)
    mask_similar = same.astype(jnp.float32)
    mask_nonsimilar = (~same).astype(jnp.float32)
    mask_combined = mask_similar * (1.0 - eye.astype(jnp.float32))
    cardinality = jnp.sum(mask_combined, axis=1)
    if attribute is not None:
        similar_attr = (
            attribute[:, None] == attribute[None, :]
        ).astype(jnp.float32)
        neg = mask_nonsimilar * similar_attr
    else:
        neg = mask_nonsimilar
    denom = jnp.sum(exp_sim * neg, axis=1, keepdims=True) + exp_sim + 1e-5
    log_prob = -jnp.log(exp_sim / denom)
    return jnp.sum(log_prob * mask_combined) / (jnp.sum(cardinality) + 1e-5)
