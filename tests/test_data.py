"""Data layer: split parity, synthetic corpus, samplers, augmentation."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
import torch
import torch.nn.functional as F

from mdvit_tpu.data import augment as aug
from mdvit_tpu.data.datasets import (
    _resize_bilinear_np,
    _resize_nearest_np,
    synthetic_domain_arrays,
    write_kfold_splits,
)
from mdvit_tpu.data.loader import (
    DeviceDomainStore,
    RoundRobinSampler,
    eval_batches,
    gather_batch,
)


def test_kfold_split_matches_reference_recipe(tmp_path):
    """Fold assignment must reproduce random.Random(42).shuffle over the meta
    csv rows (create_dataset.py:61-70)."""
    import random

    n = 53
    df = pd.DataFrame({
        "ID": [f"{i:04d}" for i in range(n)],
        "diagnosis": ["nevus"] * n,
        "diagnosis_id": [0] * n,
    })
    d = tmp_path / "isic2018"
    d.mkdir()
    df.to_csv(d / "meta_isic2018.csv", index=False)
    write_kfold_splits(str(d), "isic2018")

    index_list = list(range(n))
    random.Random(42).shuffle(index_list)
    split_size = int(n / 5.0 + 0.5)
    ids = [0, split_size, split_size * 2, split_size * 3, split_size * 4, n]
    for k in range(5):
        test_df = pd.read_csv(d / f"test_meta_kfold_{k}.csv", dtype={"ID": str})
        want = [f"{i:04d}" for i in [index_list[j] for j in range(ids[k], ids[k + 1])]]
        assert list(test_df["ID"]) == want


def test_resize_helpers_match_torch(rng):
    img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    got = _resize_bilinear_np(img, 32)
    want = F.interpolate(
        torch.from_numpy(img.astype(np.float32)).permute(2, 0, 1)[None],
        size=(32, 32), mode="bilinear", align_corners=False,
    )[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(got, want, atol=1e-3)

    mask = (rng.rand(64, 64) > 0.5).astype(np.uint8)
    got_n = _resize_nearest_np(mask, 32)
    assert got_n.shape == (32, 32)
    assert set(np.unique(got_n)) <= {0, 1}


def test_synthetic_deterministic():
    a = synthetic_domain_arrays("PH2", 32, 4, 2)
    b = synthetic_domain_arrays("PH2", 32, 4, 2)
    np.testing.assert_array_equal(a["train"].images, b["train"].images)
    assert a["train"].images.shape == (4, 32, 32, 3)
    assert a["train"].masks.max() == 1


def test_round_robin_sampler_drop_last_and_reshuffle():
    s = RoundRobinSampler([10, 3, 7], batch_size=2, seed=0)
    assert s.steps_per_epoch == 5
    seen = [set(), set(), set()]
    for _ in range(20):
        batch = s.next_batch()
        assert batch.shape == (3, 2)
        for d in range(3):
            assert all(0 <= i < [10, 3, 7][d] for i in batch[d])
            seen[d].update(batch[d].tolist())
    assert seen[0] == set(range(10))
    # domain 1 has 3 samples, batch 2, drop_last → index 3rd sample may be
    # dropped per pass but reshuffles mean all indices eventually appear
    assert len(seen[1]) >= 2


def test_gather_batch_layout():
    doms = [synthetic_domain_arrays(n, 16, 6, 2)["train"]
            for n in ("isic2018", "PH2", "DMF", "SKD")]
    store = DeviceDomainStore(doms)
    idx = jnp.asarray(np.stack([[0, 1]] * 4).astype(np.int32))
    imgs, masks, onehot = jax.jit(gather_batch)(store.images, store.masks, idx)
    assert imgs.shape == (8, 16, 16, 3)
    assert masks.shape == (8, 16, 16)
    np.testing.assert_array_equal(
        np.asarray(onehot), np.eye(4, dtype=np.float32).repeat(2, axis=0)
    )
    np.testing.assert_allclose(
        np.asarray(imgs[2]), doms[1].images[0].astype(np.float32)
    )


def test_eval_batches_padding():
    dom = synthetic_domain_arrays("SKD", 16, 4, 7)["test"]
    batches = list(eval_batches(dom, 5))
    assert len(batches) == 2
    assert batches[0][2] == 5 and batches[1][2] == 2
    assert batches[1][0].shape == (5, 16, 16, 3)


def test_eval_index_batches_mirror_eval_batches():
    """The index-only generator must walk the split exactly like
    eval_batches: same batch count, same valid counts, indices covering the
    domain's absolute store rows in order, tail padded to a static shape
    with an in-range row."""
    from mdvit_tpu.data.loader import eval_index_batches

    batches = list(eval_index_batches(offset=10, n=7, batch_size=5, pad_to=8))
    assert [v for _, v in batches] == [5, 2]
    idx0, idx1 = batches[0][0], batches[1][0]
    assert idx0.shape == (8,) and idx0.dtype == np.int32
    np.testing.assert_array_equal(idx0[:5], np.arange(10, 15))
    np.testing.assert_array_equal(idx1[:2], np.arange(15, 17))
    # padding rows repeat the domain's first row — always in range
    np.testing.assert_array_equal(idx0[5:], 10)
    np.testing.assert_array_equal(idx1[2:], 10)


def test_eval_split_store_concat_offsets():
    from mdvit_tpu.data.loader import EvalSplitStore

    doms = [synthetic_domain_arrays(n, 16, 4, k)["test"]
            for n, k in (("PH2", 3), ("SKD", 7))]
    store = EvalSplitStore(doms)
    assert store.images.shape == (10, 16, 16, 3)
    assert store.masks.shape == (10, 16, 16)
    assert store.domain(0) == (0, 3) and store.domain(1) == (3, 7)
    np.testing.assert_array_equal(np.asarray(store.images[3:]), doms[1].images)


# ---------------- augmentation ----------------

def test_normalize_matches_reference(rng):
    x = rng.randint(0, 255, (2, 8, 8, 3)).astype(np.float32)
    got = np.asarray(aug.normalize(jnp.asarray(x)))
    want = (x / 255.0 - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
    # float32 computation vs float64 reference near zero-crossings
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_reflect101():
    got = np.asarray(aug._reflect101(jnp.arange(-3, 8), 5))
    #  cv2 BORDER_REFLECT_101 for size 5: index -1→1, -2→2, 5→3, 6→2, 7→1
    np.testing.assert_array_equal(got, [3, 2, 1, 0, 1, 2, 3, 4, 3, 2, 1])


def test_affine_identity_is_noop(rng):
    img = jnp.asarray(rng.rand(16, 16, 3).astype(np.float32))
    a_inv, t_inv = aug._rotation_matrix(
        jnp.float32(0.0), jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0),
        16, 16,
    )
    out = aug._affine_sample(img, a_inv, t_inv, nearest=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_affine_pure_shift_matches_roll(rng):
    """Pure integer shift: dx=0.25 on a 16px image = 4px shift; interior
    pixels must equal a roll."""
    img = jnp.asarray(rng.rand(16, 16, 1).astype(np.float32))
    a_inv, t_inv = aug._rotation_matrix(
        jnp.float32(0.0), jnp.float32(1.0), jnp.float32(0.25), jnp.float32(0.0),
        16, 16,
    )
    out = np.asarray(aug._affine_sample(img, a_inv, t_inv, nearest=False))
    want = np.asarray(img)
    np.testing.assert_allclose(out[:, 4:], want[:, :-4], atol=1e-5)


def test_affine_rotation_90deg_point_mapping():
    """cv2.warpAffine convention: a delta at source pixel p lands at M·p in
    the destination. For a 32² image (center 16,16) rotated +90°:
    src (row 12, col 5) → dst (row cx+cy−col = 27, col = row = 12)."""
    img = np.zeros((32, 32, 1), np.float32)
    img[12, 5, 0] = 1.0
    a_inv, t_inv = aug._rotation_matrix(
        jnp.float32(90.0), jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0),
        32, 32,
    )
    out = np.asarray(
        aug._affine_sample(jnp.asarray(img), a_inv, t_inv, nearest=False)
    )[..., 0]
    assert out[27, 12] > 0.99
    assert out.sum() == pytest.approx(1.0, abs=1e-4)


def test_augment_batch_shapes_and_determinism(rng):
    imgs = jnp.asarray(rng.randint(0, 255, (4, 16, 16, 3)).astype(np.float32))
    masks = jnp.asarray((rng.rand(4, 16, 16) > 0.5).astype(np.float32))
    key = jax.random.PRNGKey(0)
    x1, y1 = jax.jit(aug.augment_batch)(key, imgs, masks)
    x2, y2 = jax.jit(aug.augment_batch)(key, imgs, masks)
    assert x1.shape == (4, 16, 16, 3) and y1.shape == (4, 16, 16, 1)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    assert set(np.unique(np.asarray(y1))) <= {0.0, 1.0}
    # different key → different augs
    x3, _ = jax.jit(aug.augment_batch)(jax.random.PRNGKey(7), imgs, masks)
    assert not np.allclose(np.asarray(x1), np.asarray(x3))
