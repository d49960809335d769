"""Augmentation golden tests.

Pins the production single-gather warp (``_ssr_apply``) against the
reference-style per-sample sampler (``_ssr_single``) on dense values, and the
GaussNoise / RandomBrightnessContrast formulas against albumentations 1.1
defaults (``Datasets/create_dataset.py:132-139``: GaussNoise var U(10,50);
RandomBrightnessContrast ±0.2, brightness_by_max=True ⇒ +β·255).
"""
import jax
import jax.numpy as jnp
import numpy as np

from mdvit_tpu.data.augment import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    _affine_sample,
    _reflect101,
    _rotation_matrix,
    _ssr_apply,
    _ssr_single,
    augment_batch,
    fast_normal,
    normalize,
)


def _interior_mask(angle, scale, shift, h, w):
    """Pixels whose 4 bilinear taps need no border reflection (both warps are
    exact there)."""
    a_inv, t_inv = _rotation_matrix(
        jnp.float32(angle), jnp.float32(scale),
        jnp.float32(shift[0]), jnp.float32(shift[1]), h, w)
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    sx = a_inv[0, 0] * xs + a_inv[0, 1] * ys + t_inv[0]
    sy = a_inv[1, 0] * xs + a_inv[1, 1] * ys + t_inv[1]
    x0, y0 = jnp.floor(sx), jnp.floor(sy)
    return np.asarray(
        (x0 >= 0) & (x0 + 1 <= w - 1) & (y0 >= 0) & (y0 + 1 <= h - 1)
    )


def test_ssr_batch_matches_single_dense(rng):
    """Dense-value equivalence of the batched single-gather warp vs the
    4-gather reference path: interior pixels bitwise-exact, border deltas
    bounded by the local dynamic range."""
    h = w = 33
    b = 4
    imgs = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255.0)
    msks = jnp.asarray((rng.rand(b, h, w) > 0.5).astype(np.float32))
    params = [
        (0.0, 1.0, (0.0, 0.0)),           # identity
        (30.0, 1.05, (0.05, -0.03)),      # generic rotate+scale+shift
        (-45.0, 0.9, (-0.0625, 0.0625)),  # extreme corners of the ranges
        (7.3, 1.0, (0.0, 0.0)),           # pure rotation
    ]
    angle = jnp.asarray([p[0] for p in params], jnp.float32)
    scale = jnp.asarray([p[1] for p in params], jnp.float32)
    shift = jnp.asarray([[p[2][0], p[2][1]] for p in params], jnp.float32)

    out_b_img, out_b_msk = jax.jit(_ssr_apply)(imgs, msks, angle, scale, shift)

    for i, (an, sc, sh) in enumerate(params):
        a_inv, t_inv = _rotation_matrix(
            jnp.float32(an), jnp.float32(sc), jnp.float32(sh[0]),
            jnp.float32(sh[1]), h, w)
        ref_img = _affine_sample(imgs[i], a_inv, t_inv, nearest=False)
        ref_msk = _affine_sample(msks[i][..., None], a_inv, t_inv,
                                 nearest=True)[..., 0]
        interior = _interior_mask(an, sc, sh, h, w)
        assert interior.mean() > 0.5  # the test must exercise real coverage
        d_img = np.abs(np.asarray(out_b_img[i] - ref_img))
        np.testing.assert_allclose(
            d_img[interior], 0.0, atol=1e-3,
            err_msg=f"interior mismatch for params {params[i]}")
        # border: reflected +1-neighbour may differ by one pixel → bounded by
        # the value range, and masks stay binary
        assert d_img.max() <= 255.0
        d_msk = np.asarray(out_b_msk[i] - ref_msk)
        assert np.all((np.asarray(out_b_msk[i]) == 0)
                      | (np.asarray(out_b_msk[i]) == 1))
        np.testing.assert_array_equal(d_msk[interior], 0.0)


def test_ssr_identity_is_exact(rng):
    """angle=0, scale=1, shift=0 must return the input bit-for-bit —
    p=0.5 'not applied' samples must not be perturbed by the warp."""
    h = w = 32
    imgs = jnp.asarray(rng.rand(2, h, w, 3).astype(np.float32) * 255.0)
    msks = jnp.asarray((rng.rand(2, h, w) > 0.5).astype(np.float32))
    zero = jnp.zeros((2,), jnp.float32)
    out_img, out_msk = _ssr_apply(imgs, msks, zero, zero + 1.0,
                                  jnp.zeros((2, 2), jnp.float32))
    np.testing.assert_allclose(np.asarray(out_img), np.asarray(imgs),
                               atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out_msk), np.asarray(msks))


def test_ssr_single_matches_batch_rng_semantics():
    """_ssr_single (per-sample keys) and _ssr_batch draw from the same
    parameter distributions; check the single path still runs and warps."""
    key = jax.random.PRNGKey(7)
    img = jnp.asarray(np.arange(32 * 32 * 3, dtype=np.float32).reshape(
        32, 32, 3))
    msk = jnp.zeros((32, 32), jnp.float32)
    out_img, out_msk = _ssr_single(img, msk, key)
    assert out_img.shape == img.shape and out_msk.shape == msk.shape


def test_gauss_noise_distribution():
    """fast_normal scaled by U(10,50)-variance must land in the
    albumentations GaussNoise(var_limit=(10, 50)) envelope."""
    seed = jnp.uint32(1234)
    n = fast_normal(seed, (64, 64, 64))
    n = np.asarray(n)
    assert abs(n.mean()) < 0.01
    assert abs(n.std() - 1.0) < 0.01
    # albumentations: sigma = sqrt(var), var ~ U(10, 50) → per-image noise
    # std between sqrt(10)≈3.16 and sqrt(50)≈7.07 on the 0..255 scale
    key = jax.random.PRNGKey(0)
    var = jax.random.uniform(key, (512, 1, 1, 1), minval=10.0, maxval=50.0)
    v = np.asarray(var)
    assert v.min() >= 10.0 and v.max() <= 50.0
    sigmas = np.sqrt(v).ravel()
    assert sigmas.min() >= np.sqrt(10) - 1e-5
    assert sigmas.max() <= np.sqrt(50) + 1e-5


def test_brightness_contrast_formula(rng):
    """The applied transform must be clip(img·α + β·255) with α∈[0.8,1.2],
    β∈[−0.2,0.2] (brightness_by_max=True), exactly reproducing
    augment_batch's internal draws."""
    b, h, w = 8, 16, 16
    imgs = rng.rand(b, h, w, 3).astype(np.float32) * 255.0
    masks = (rng.rand(b, h, w) > 0.5).astype(np.float32)
    key = jax.random.PRNGKey(3)

    out, labels = jax.jit(augment_batch)(key, jnp.asarray(imgs),
                                         jnp.asarray(masks))
    out = np.asarray(out)

    # replicate augment_batch's RNG stream for the BC stage
    _, _, _, _, _, k_bc = jax.random.split(key, 6)
    kb1, kb2, kb3 = jax.random.split(k_bc, 3)
    apply_bc = np.asarray(jax.random.bernoulli(kb1, 0.5, (b, 1, 1, 1)))
    alpha = np.asarray(
        1.0 + jax.random.uniform(kb2, (b, 1, 1, 1), minval=-0.2, maxval=0.2))
    beta = np.asarray(
        jax.random.uniform(kb3, (b, 1, 1, 1), minval=-0.2, maxval=0.2))
    assert np.all(alpha >= 0.8) and np.all(alpha <= 1.2)
    assert np.all(np.abs(beta) <= 0.2)

    # invert the final normalize to recover the 0..255 image augment_batch
    # produced, then check the BC relation against the pre-BC image by
    # re-running with a key whose BC stage is forced off: instead reconstruct
    # pre-BC from the same stream (noise/flip/ssr are shared), i.e. compare
    # the two applies directly
    mean = np.asarray(IMAGENET_MEAN)
    std = np.asarray(IMAGENET_STD)
    img255 = (out * std + mean) * 255.0

    # recompute the pipeline up to (not including) BC with the same key
    k_noise, k_napply, k_h, k_v, k_ssr, _ = jax.random.split(key, 6)
    from mdvit_tpu.data.augment import _seed_from_key, _ssr_batch, fast_normal

    x = jnp.asarray(imgs)
    var = jax.random.uniform(
        jax.random.fold_in(k_noise, 1), (b, 1, 1, 1), minval=10.0,
        maxval=50.0)
    noise = fast_normal(_seed_from_key(k_noise), x.shape) * jnp.sqrt(var)
    apply_n = jax.random.bernoulli(k_napply, 0.5, (b, 1, 1, 1))
    x = jnp.clip(x + jnp.where(apply_n, noise, 0.0), 0.0, 255.0)
    fh = jax.random.bernoulli(k_h, 0.5, (b, 1, 1, 1))
    fv = jax.random.bernoulli(k_v, 0.5, (b, 1, 1, 1))
    x = jnp.where(fh, x[:, :, ::-1], x)
    x = jnp.where(fv, x[:, ::-1], x)
    m = jnp.asarray(masks)
    m = jnp.where(fh[..., 0], m[:, :, ::-1], m)
    m = jnp.where(fv[..., 0], m[:, ::-1], m)
    x, m = _ssr_batch(x, m, k_ssr)
    pre_bc = np.asarray(x)

    want = np.where(apply_bc,
                    np.clip(pre_bc * alpha + beta * 255.0, 0.0, 255.0),
                    pre_bc)
    np.testing.assert_allclose(img255, want, atol=0.02)


def test_reflect101_against_literal():
    """cv2 BORDER_REFLECT_101 folding on a size-5 axis: indices -3..7 map to
    3,2,1,0,1,2,3,4,3,2,1 (gfedcb|abcdefgh|gfedcb with no edge repeat)."""
    got = np.asarray(_reflect101(jnp.arange(-3, 8), 5))
    np.testing.assert_array_equal(got, [3, 2, 1, 0, 1, 2, 3, 4, 3, 2, 1])


def test_normalize_matches_reference(rng):
    """norm01 (clip/255) + ImageNet mean/std (create_dataset.py:25,143-144)."""
    x = rng.rand(2, 8, 8, 3).astype(np.float32) * 300.0 - 20.0
    got = np.asarray(normalize(jnp.asarray(x)))
    want = (np.clip(x, 0, 255) / 255.0 - np.asarray(IMAGENET_MEAN)) / \
        np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_ssr_block_warp_exact_everywhere(rng):
    """The production 2×2-block warp (`_ssr_apply_block`) matches the exact
    per-sample cv2-semantics warp (`_affine_sample`, reflected second taps)
    at EVERY pixel — including borders, where the old shifted-copy packing
    deviated by ±1 source pixel."""
    from mdvit_tpu.data.augment import _ssr_apply_block

    h = w = 48
    imgs = jnp.asarray(
        np.floor(rng.rand(5, h, w, 3) * 256).clip(0, 255).astype(np.float32))
    msks = jnp.asarray((rng.rand(5, h, w) > 0.5).astype(np.float32))
    angle = jnp.asarray([0.0, 30.0, -45.0, 7.3, 44.9], jnp.float32)
    scale = jnp.asarray([1.0, 1.05, 0.9, 1.0, 1.1], jnp.float32)
    shift = jnp.asarray(
        [[0, 0], [0.05, -0.03], [-0.0625, 0.0625], [0, 0], [0.06, 0.06]],
        jnp.float32)

    def one(img, mask, an, sc, sh):
        a_inv, t_inv = _rotation_matrix(an, sc, sh[0], sh[1], h, w)
        oi = _affine_sample(img, a_inv, t_inv, nearest=False)
        om = _affine_sample(mask[..., None], a_inv, t_inv, nearest=True)[..., 0]
        return oi, om

    ref_i, ref_m = jax.jit(jax.vmap(one))(imgs, msks, angle, scale, shift)
    out_i, out_m = jax.jit(_ssr_apply_block)(imgs, msks, angle, scale, shift)

    # Exclude floor/round-unstable pixels: where a source coordinate sits
    # within an ulp-scale band of an integer (or of .5 for the nearest mask),
    # the two differently-fused programs may legitimately round opposite ways.
    stable = np.ones((5, h, w), bool)
    for i in range(5):
        a_inv, t_inv = _rotation_matrix(
            angle[i], scale[i], shift[i, 0], shift[i, 1], h, w)
        a_inv = np.asarray(a_inv, np.float64)
        t_inv = np.asarray(t_inv, np.float64)
        ys, xs = np.meshgrid(np.arange(h, dtype=np.float64),
                             np.arange(w, dtype=np.float64), indexing="ij")
        sx = a_inv[0, 0] * xs + a_inv[0, 1] * ys + t_inv[0]
        sy = a_inv[1, 0] * xs + a_inv[1, 1] * ys + t_inv[1]
        for s_ in (sx, sy):
            fr = s_ - np.floor(s_)
            d0 = np.minimum(fr, 1 - fr)
            dh = np.abs(fr - 0.5)
            # exactly-on-boundary coords round identically in both programs;
            # only a strictly-inside ulp-scale band is ambiguous
            stable[i] &= ~(((d0 > 0) & (d0 < 1e-3)) | ((dh > 0) & (dh < 1e-3)))
    di = np.abs(np.asarray(out_i) - np.asarray(ref_i)).max(-1)
    dm = np.abs(np.asarray(out_m) - np.asarray(ref_m))
    assert stable.mean() > 0.95  # the mask only strips a sliver
    assert di[stable].max() < 5e-3, di[stable].max()  # fp assoc, ≪ 1 LSB
    assert dm[stable].max() == 0.0, dm[stable].max()
