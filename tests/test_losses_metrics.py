"""Loss/metric numerical parity.

Losses are pinned against literal torch re-derivations of the reference
formulas (``Utils/losses.py:8-16``, ``nn.BCELoss`` after sigmoid,
``multi_train_TransFuse.py:27-38``); metrics against a numpy
literal-definition implementation of medpy's ``dc``/``jc`` (global binary
overlap, 0 on empty denominators).
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from mdvit_tpu.train import losses as L
from mdvit_tpu.train import metrics as M


def torch_dice_loss(score, target):
    smooth = 1e-5
    intersect = torch.sum(score * target)
    y_sum = torch.sum(target * target)
    z_sum = torch.sum(score * score)
    return 1 - (2 * intersect + smooth) / (z_sum + y_sum + smooth)


def test_dice_loss_matches_torch(rng):
    p = torch.sigmoid(torch.from_numpy(rng.randn(2, 8, 8, 1).astype(np.float32)))
    t = torch.from_numpy((rng.rand(2, 8, 8, 1) > 0.5).astype(np.float32))
    want = torch_dice_loss(p, t).item()
    got = float(L.dice_loss(jnp.asarray(p.numpy()), jnp.asarray(t.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_bce_forms_match_torch(rng):
    logits = rng.randn(2, 8, 8, 1).astype(np.float32) * 3
    t = (rng.rand(2, 8, 8, 1) > 0.5).astype(np.float32)
    want = torch.nn.BCELoss()(
        torch.sigmoid(torch.from_numpy(logits)), torch.from_numpy(t)
    ).item()
    got_probs = float(
        L.bce_loss(jax.nn.sigmoid(jnp.asarray(logits)), jnp.asarray(t))
    )
    got_logits = float(L.bce_with_logits(jnp.asarray(logits), jnp.asarray(t)))
    np.testing.assert_allclose(got_probs, want, rtol=1e-5)
    np.testing.assert_allclose(got_logits, want, rtol=1e-5)


def test_bce_loss_clamps_like_torch():
    # torch.BCELoss clamps log terms at -100 so exact 0/1 probs are finite
    p = jnp.asarray([[0.0, 1.0]], jnp.float32)
    t = jnp.asarray([[1.0, 0.0]], jnp.float32)
    want = torch.nn.BCELoss()(
        torch.tensor([[0.0, 1.0]]), torch.tensor([[1.0, 0.0]])
    ).item()
    np.testing.assert_allclose(float(L.bce_loss(p, t)), want, rtol=1e-6)


def test_structure_loss_matches_torch(rng):
    logits = rng.randn(2, 1, 48, 48).astype(np.float32) * 2
    mask = (rng.rand(2, 1, 48, 48) > 0.6).astype(np.float32)

    pred_t, mask_t = torch.from_numpy(logits), torch.from_numpy(mask)
    weit = 1 + 5 * torch.abs(
        F.avg_pool2d(mask_t, kernel_size=31, stride=1, padding=15) - mask_t
    )
    wbce = F.binary_cross_entropy_with_logits(pred_t, mask_t, reduction="none")
    wbce = (weit * wbce).sum(dim=(2, 3)) / weit.sum(dim=(2, 3))
    pred_s = torch.sigmoid(pred_t)
    inter = ((pred_s * mask_t) * weit).sum(dim=(2, 3))
    union = ((pred_s + mask_t) * weit).sum(dim=(2, 3))
    wiou = 1 - (inter + 1) / (union - inter + 1)
    want = (wbce + wiou).mean().item()

    got = float(
        L.structure_loss(
            jnp.asarray(logits.transpose(0, 2, 3, 1)),
            jnp.asarray(mask.transpose(0, 2, 3, 1)),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def np_dc(pred, target):
    inter = np.count_nonzero(pred & target)
    denom = np.count_nonzero(pred) + np.count_nonzero(target)
    return 2.0 * inter / denom if denom > 0 else 0.0


def np_jc(pred, target):
    inter = np.count_nonzero(pred & target)
    union = np.count_nonzero(pred | target)
    return inter / union if union > 0 else 0.0


def test_metrics_match_medpy_definition(rng):
    probs = rng.rand(3, 16, 16, 1).astype(np.float32)
    target = (rng.rand(3, 16, 16, 1) > 0.5).astype(np.float32)
    pred = probs > 0.5
    tgt = target > 0.5
    got = M.seg_metrics(jnp.asarray(probs), jnp.asarray(target))
    np.testing.assert_allclose(float(got["dice"]), np_dc(pred, tgt), rtol=1e-6)
    np.testing.assert_allclose(float(got["iou"]), np_jc(pred, tgt), rtol=1e-6)


def test_metrics_empty_masks():
    z = jnp.zeros((2, 4, 4, 1))
    got = M.seg_metrics(z, z)
    assert float(got["dice"]) == 0.0
    assert float(got["iou"]) == 0.0


def test_dice_per_image(rng):
    probs = (rng.rand(4, 8, 8, 1) > 0.5).astype(np.float32)
    target = (rng.rand(4, 8, 8, 1) > 0.5).astype(np.float32)
    got = np.asarray(M.dice_per_image(jnp.asarray(probs), jnp.asarray(target)))
    for i in range(4):
        np.testing.assert_allclose(
            got[i], np_dc(probs[i] > 0.5, target[i] > 0.5), rtol=1e-6
        )
