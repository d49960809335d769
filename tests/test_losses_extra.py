"""Parity tests for the shipped-but-unused loss family
(``Utils/losses.py:52-353``) against torch/numpy re-derivations."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from mdvit_tpu.train.losses_extra import (
    aaai_sdf_loss,
    compute_fore_dist,
    compute_sdf01,
    compute_sdf1_1,
    entropy_loss_map,
    sdf_kl_loss,
    softmax_dice_loss,
    softmax_kl_loss,
    softmax_mse_loss,
    supervised_contrastive_loss,
    symmetric_mse_loss,
)


def _nchw(x):  # ours is channel-last; torch reference is channel-first
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


def test_softmax_consistency_losses(rng):
    a = rng.randn(4, 8, 8, 3).astype(np.float32)
    b = rng.randn(4, 8, 8, 3).astype(np.float32)
    ta, tb = _nchw(a), _nchw(b)

    got = np.asarray(softmax_mse_loss(jnp.asarray(a), jnp.asarray(b)))
    want = ((F.softmax(ta, 1) - F.softmax(tb, 1)) ** 2).numpy()
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1), rtol=1e-5,
                               atol=1e-6)

    got = np.asarray(softmax_kl_loss(jnp.asarray(a), jnp.asarray(b)))
    want = F.kl_div(F.log_softmax(ta, 1), F.softmax(tb, 1),
                    reduction="none").numpy()
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1), rtol=1e-4,
                               atol=1e-6)

    got = float(symmetric_mse_loss(jnp.asarray(a), jnp.asarray(b)))
    want = float(torch.mean((ta - tb) ** 2))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # softmax_dice: per-class non-squared dice averaged over classes
    got = float(softmax_dice_loss(jnp.asarray(a), jnp.asarray(b)))
    pa, pb = F.softmax(ta, 1), F.softmax(tb, 1)
    smooth = 1e-5
    dice = 0.0
    for i in range(3):
        inter = float((pa[:, i] * pb[:, i]).sum())
        dice += 1 - (2 * inter + smooth) / (
            float(pa[:, i].sum()) + float(pb[:, i].sum()) + smooth)
    np.testing.assert_allclose(got, dice / 3, rtol=1e-5)

    p = np.abs(rng.rand(2, 4, 4, 2)).astype(np.float32)
    got = np.asarray(entropy_loss_map(jnp.asarray(p)))
    want = -np.sum(p * np.log(p + 1e-6), axis=-1, keepdims=True) / np.log(2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _brute_edt(mask):
    """O(n²) exact euclidean distance of nonzero pixels to nearest zero."""
    h, w = mask.shape
    zeros = np.argwhere(mask == 0)
    out = np.zeros((h, w))
    for y in range(h):
        for x in range(w):
            if mask[y, x]:
                d2 = ((zeros - [y, x]) ** 2).sum(1)
                out[y, x] = np.sqrt(d2.min()) if len(zeros) else 0.0
    return out


def test_sdf_maps(rng):
    mask = np.zeros((1, 1, 12, 12), np.uint8)
    mask[0, 0, 3:9, 4:10] = 1

    sdf = compute_sdf1_1(mask)[0, 0]
    pos = _brute_edt(mask[0, 0])
    neg = _brute_edt(1 - mask[0, 0])
    want = neg / neg.max() - pos / pos.max()
    # boundary (inner, 4-adjacent to background) forced to 0
    inner = mask[0, 0].astype(bool) & (
        np.pad(mask[0, 0], 1, mode="edge")[:-2, 1:-1] == 0)
    assert np.all(sdf[3, 4:10] == 0)  # top edge of the square is boundary
    np.testing.assert_allclose(sdf[~mask[0, 0].astype(bool)],
                               want[~mask[0, 0].astype(bool)], atol=1e-9)

    sdf01 = compute_sdf01(mask)[0, 0]
    assert np.all(sdf01[3, 4:10] == 0.5)
    assert sdf01.min() >= 0.0 and sdf01.max() <= 1.0
    # inside < 0.5 < outside
    assert sdf01[6, 6] < 0.5 < sdf01[0, 0]

    fore = compute_fore_dist(mask)[0, 0]
    np.testing.assert_allclose(fore, pos / pos.max(), atol=1e-9)

    # empty mask → all zeros, no NaN
    assert np.all(compute_sdf1_1(np.zeros((1, 1, 8, 8), np.uint8)) == 0)


def test_aaai_sdf_loss_matches_torch(rng):
    out = rng.randn(2, 2, 8, 8).astype(np.float32)
    gt = (rng.rand(2, 2, 8, 8) > 0.5).astype(np.float32)
    gt_sdm = compute_sdf1_1(gt).astype(np.float32)

    got = float(aaai_sdf_loss(jnp.asarray(out), jnp.asarray(gt_sdm)))

    t_out, t_sdm = torch.from_numpy(out), torch.from_numpy(gt_sdm)
    smooth = 1e-5
    axes = (2, 3)
    inter = (t_out * t_sdm).sum(axes)
    pd = (t_out ** 2).sum(axes)
    gts = (t_sdm ** 2).sum(axes)
    lp = (inter + smooth) / (inter + pd + gts)
    want = float(-lp.mean() + torch.norm(t_out - t_sdm, 1) / t_out.numel())
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sdf_kl_loss_matches_torch(rng):
    out = rng.randn(2, 1, 8, 8).astype(np.float32)  # log-space input
    gt_sdf = np.abs(rng.rand(2, 2, 8, 8)).astype(np.float32)
    got = float(sdf_kl_loss(jnp.asarray(out), jnp.asarray(gt_sdf)))
    want = float(F.kl_div(torch.from_numpy(out),
                          torch.from_numpy(gt_sdf + 1e-5)[:, 1:2],
                          reduction="batchmean"))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_supervised_contrastive_matches_reference_formula(rng):
    z = rng.randn(6, 16).astype(np.float32)
    targets = np.array([0, 0, 1, 1, 2, 0])
    attr = np.array([0, 1, 0, 1, 0, 0])

    for attribute in [None, attr]:
        got = float(supervised_contrastive_loss(
            jnp.asarray(z), jnp.asarray(targets),
            None if attribute is None else jnp.asarray(attribute),
            temperature=0.1))

        tz = torch.from_numpy(z)
        sim = F.cosine_similarity(tz.unsqueeze(1), tz.unsqueeze(0),
                                  dim=2) / 0.1
        exp = torch.exp(sim - sim.max(dim=1, keepdim=True)[0]) + 1e-5
        tt = torch.from_numpy(targets)
        sim_cls = tt.unsqueeze(1).repeat(1, 6) == tt
        anchor_out = 1 - torch.eye(6)
        nonsim = ~sim_cls
        comb = sim_cls * anchor_out
        card = comb.sum(1)
        if attribute is not None:
            ta = torch.from_numpy(attr)
            sim_attr = ta.unsqueeze(1).repeat(1, 6) == ta
            lp = -torch.log(exp / ((exp * nonsim * sim_attr).sum(
                1, keepdim=True) + exp + 1e-5))
        else:
            lp = -torch.log(exp / ((exp * nonsim).sum(1, keepdim=True)
                                   + exp + 1e-5))
        want = float((lp * comb).sum() / (card.sum() + 1e-5))
        np.testing.assert_allclose(got, want, rtol=1e-5)
