"""On-device augmentation pipeline (albumentations-equivalent, jittable).

The reference augments on CPU worker processes with albumentations
(``Datasets/create_dataset.py:132-139``):
``Resize → GaussNoise → HFlip → VFlip → ShiftScaleRotate →
RandomBrightnessContrast``, each p=0.5, followed by ``norm01`` and ImageNet
normalization (``:143-144,165``). This host is effectively single-core, so the
augs are reimplemented as pure jnp ops that run inside the jitted train step —
counter-based RNG, per-sample probabilities as data, no host work at all.

Semantics matched to albumentations 1.1 defaults:

* GaussNoise: var ~ U(10, 50), additive N(0, sqrt(var)) per pixel/channel on
  the 0..255 scale, then clip.
* ShiftScaleRotate: shift ~ U(±0.0625)·size, scale ~ 1+U(±0.1),
  rotate ~ U(±45°); cv2.warpAffine semantics (integer pixel grid, matrix from
  cv2.getRotationMatrix2D about the image center, inverse-mapped sampling),
  bilinear for image / nearest for mask, BORDER_REFLECT_101.
* RandomBrightnessContrast: img·(1+U(±0.2)) + U(±0.2)·255, clip
  (brightness_by_max=True).

Exact per-sample RNG parity with albumentations is neither possible nor
needed (SURVEY.md §7.3: distributional parity); geometry parity is pinned by
``tests/test_augment.py`` against cv2-free torch/numpy references.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)


# ---------------------------------------------------------------------------
# Fast counter-based per-pixel RNG.
#
# jax.random.normal (threefry) costs ~40 ms for the 3M noise values a batch
# needs on v5e — it dominates the whole augmentation. Augmentation noise does
# not need crypto-strength randomness, so per-pixel bits come from a SplitMix32
# -style integer hash over (seed, flat index): 6 VPU ops per value instead of
# 20 threefry rounds. Per-sample *parameters* (angles, flips) stay threefry.
# ---------------------------------------------------------------------------


def _hash_u32(x: jax.Array) -> jax.Array:
    """SplitMix32 finalizer: well-mixed 32-bit hash (lowrey/murmur3 constants)."""
    x = jnp.asarray(x, jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _seed_from_key(key: jax.Array) -> jax.Array:
    """One tiny threefry draw → uint32 seed for the hash counter."""
    return jax.random.bits(key, (), jnp.uint32)


def fast_uniform(seed: jax.Array, shape, offset: int = 0) -> jax.Array:
    """U[0,1) of `shape` from hashed counters (full batch, one pass).

    The linear counter is built from per-axis broadcasted_iotas directly in
    the target shape — a flat ``(n, 1)`` iota would be tiled with 128-lane
    padding on TPU and blow up memory traffic 128× when materialized.
    """
    idx = jnp.zeros(shape, jnp.uint32)
    stride = 1
    for axis in range(len(shape) - 1, -1, -1):
        idx = idx + jax.lax.broadcasted_iota(
            jnp.uint32, shape, axis
        ) * jnp.uint32(stride)
        stride *= shape[axis]
    mix = jnp.uint32((offset * 0x85EBCA6B) & 0xFFFFFFFF)
    bits = _hash_u32(idx + seed * jnp.uint32(0x9E3779B9) + mix)
    return (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))


def fast_normal(seed: jax.Array, shape, offset: int = 0) -> jax.Array:
    """N(0,1) via Box–Muller on two hashed-uniform streams."""
    u1 = fast_uniform(seed, shape, offset=offset * 2 + 1)
    u2 = fast_uniform(seed, shape, offset=offset * 2 + 2)
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
    return r * jnp.cos((2.0 * jnp.pi) * u2)


def normalize(images: jax.Array) -> jax.Array:
    """norm01 (clip/255, ``create_dataset.py:25``) + ImageNet normalize."""
    x = jnp.clip(images, 0.0, 255.0) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def _reflect101(coord: jax.Array, size: int) -> jax.Array:
    """cv2 BORDER_REFLECT_101 index folding: ...2 1 | 0 1 2 ... n-1 | n-2 n-3"""
    if size == 1:
        return jnp.zeros_like(coord)
    period = 2 * (size - 1)
    c = jnp.mod(coord, period)
    c = jnp.where(c < 0, c + period, c)
    return jnp.where(c >= size, period - c, c)


def _affine_sample(
    img: jax.Array, a_inv: jax.Array, t_inv: jax.Array, nearest: bool
) -> jax.Array:
    """Sample ``img (H, W, C)`` at ``A_inv·(x,y) + t_inv`` for each output
    pixel (cv2.warpAffine inverse-mapping convention, integer pixel grid)."""
    h, w = img.shape[0], img.shape[1]
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sx = a_inv[0, 0] * xs + a_inv[0, 1] * ys + t_inv[0]
    sy = a_inv[1, 0] * xs + a_inv[1, 1] * ys + t_inv[1]

    if nearest:
        # half-up rounding (cv2's fixed-point nearest), not jnp.round's
        # half-to-even — keeps exact-half coords consistent with _ssr_apply
        ix = _reflect101(jnp.floor(sx + 0.5).astype(jnp.int32), w)
        iy = _reflect101(jnp.floor(sy + 0.5).astype(jnp.int32), h)
        return img[iy, ix]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    x0i = _reflect101(x0.astype(jnp.int32), w)
    x1i = _reflect101(x0.astype(jnp.int32) + 1, w)
    y0i = _reflect101(y0.astype(jnp.int32), h)
    y1i = _reflect101(y0.astype(jnp.int32) + 1, h)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def _rotation_matrix(angle_deg, scale, dx, dy, h: int, w: int):
    """cv2.getRotationMatrix2D about (w/2, h/2) + albumentations shift."""
    theta = angle_deg * (jnp.pi / 180.0)
    alpha = scale * jnp.cos(theta)
    beta = scale * jnp.sin(theta)
    cx, cy = w / 2.0, h / 2.0
    a = jnp.stack(
        [jnp.stack([alpha, beta]), jnp.stack([-beta, alpha])]
    )  # (2, 2)
    t = jnp.stack(
        [
            (1.0 - alpha) * cx - beta * cy + dx * w,
            beta * cx + (1.0 - alpha) * cy + dy * h,
        ]
    )
    # invert: dst(x) = src(A⁻¹(x - t))
    det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    a_inv = (
        jnp.stack(
            [jnp.stack([a[1, 1], -a[0, 1]]), jnp.stack([-a[1, 0], a[0, 0]])]
        )
        / det
    )
    t_inv = -a_inv @ t
    return a_inv, t_inv


def _ssr_single(img, mask, key):
    """ShiftScaleRotate on one (H, W, C) image + (H, W) mask (reference
    implementation, kept for geometry tests; the batched fast path is
    ``_ssr_batch``)."""
    h, w = img.shape[0], img.shape[1]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    apply = jax.random.bernoulli(k1, 0.5)
    angle = jnp.where(apply, jax.random.uniform(k2, minval=-45.0, maxval=45.0), 0.0)
    scale = jnp.where(
        apply, 1.0 + jax.random.uniform(k3, minval=-0.1, maxval=0.1), 1.0
    )
    shift = jnp.where(
        apply,
        jax.random.uniform(k4, (2,), minval=-0.0625, maxval=0.0625),
        jnp.zeros(2),
    )
    a_inv, t_inv = _rotation_matrix(angle, scale, shift[0], shift[1], h, w)
    img_out = _affine_sample(img, a_inv, t_inv, nearest=False)
    mask_out = _affine_sample(mask[..., None], a_inv, t_inv, nearest=True)[..., 0]
    return img_out, mask_out


def _shift_reflect(x: jax.Array, axis: int) -> jax.Array:
    """x shifted by +1 along axis with BORDER_REFLECT_101 at the far edge:
    out[i] = x[i+1] for i<n-1, out[n-1] = x[n-2]."""
    n = x.shape[axis]
    main = jax.lax.slice_in_dim(x, 1, n, axis=axis)
    edge = jax.lax.slice_in_dim(x, n - 2, n - 1, axis=axis)
    return jnp.concatenate([main, edge], axis=axis)


def _ssr_apply(images: jax.Array, masks: jax.Array, angle: jax.Array,
               scale: jax.Array, shift: jax.Array):
    """Batched ShiftScaleRotate warp with one full-resolution gather.

    Superseded in production by ``_ssr_apply_block`` (¼ the gather indices,
    exact borders); kept as the dense-value test reference for the packing
    formulation.

    TPU gathers are index-bound (~10 ns/index), so the naive 4-tap bilinear
    (4 gathers) + nearest mask (1 more) costs ~50 ms/step. Instead the four
    bilinear taps and the mask are packed into channels of reflect-shifted
    copies — [img, img→x, img→y, img→xy, mask ×4] — and fetched with a single
    ``take_along_axis``. In reflected border regions the +1 neighbour of a
    folded coordinate differs from cv2's by one pixel (reflection reverses
    direction); interior pixels are exact (pinned vs ``_ssr_single`` by
    ``tests/test_augment.py``).

    ``angle (B,)`` degrees, ``scale (B,)``, ``shift (B, 2)`` fractional.
    """
    b, h, w, c = images.shape
    a_inv, t_inv = jax.vmap(
        lambda an, sc, dx, dy: _rotation_matrix(an, sc, dx, dy, h, w)
    )(angle, scale, shift[:, 0], shift[:, 1])  # (B,2,2), (B,2)

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sx = (
        a_inv[:, 0, 0, None, None] * xs
        + a_inv[:, 0, 1, None, None] * ys
        + t_inv[:, 0, None, None]
    )  # (B,H,W)
    sy = (
        a_inv[:, 1, 0, None, None] * xs
        + a_inv[:, 1, 1, None, None] * ys
        + t_inv[:, 1, None, None]
    )
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = _reflect101(x0.astype(jnp.int32), w)
    y0i = _reflect101(y0.astype(jnp.int32), h)

    # pack taps: [img, img+x, img+y, img+xy, mask, mask+x, mask+y, mask+xy]
    img_x = _shift_reflect(images, 2)
    img_y = _shift_reflect(images, 1)
    img_xy = _shift_reflect(img_x, 1)
    m = masks[..., None]
    m_x = _shift_reflect(m, 2)
    m_y = _shift_reflect(m, 1)
    m_xy = _shift_reflect(m_x, 1)
    packed = jnp.concatenate(
        [images, img_x, img_y, img_xy, m, m_x, m_y, m_xy], axis=-1
    )  # (B,H,W,4C+4)

    flat = packed.reshape(b, h * w, 4 * c + 4)
    idx = (y0i * w + x0i).reshape(b, h * w, 1)
    taps = jnp.take_along_axis(flat, idx, axis=1).reshape(b, h, w, 4 * c + 4)

    v00, v01 = taps[..., 0:c], taps[..., c:2 * c]
    v10, v11 = taps[..., 2 * c:3 * c], taps[..., 3 * c:4 * c]
    fxc = fx[..., None]
    fyc = fy[..., None]
    out_img = (
        v00 * (1 - fxc) * (1 - fyc)
        + v01 * fxc * (1 - fyc)
        + v10 * (1 - fxc) * fyc
        + v11 * fxc * fyc
    )

    m00, m01, m10, m11 = (taps[..., 4 * c + i] for i in range(4))
    # nearest-neighbour mask: pick the tap the rounded coordinate lands on
    mx = fx >= 0.5
    my = fy >= 0.5
    out_mask = jnp.where(
        my,
        jnp.where(mx, m11, m10),
        jnp.where(mx, m01, m00),
    )
    return out_img, out_mask


def _pack_rgbm_u32(images: jax.Array, masks: jax.Array) -> jax.Array:
    """Pack integer-valued RGB (0..255) + binary mask into one uint32 word
    per pixel: ``r | g<<8 | b<<16 | m<<24``. Lossless for uint8-valued
    floats."""
    iu = images.astype(jnp.uint32)
    mu = masks.astype(jnp.uint32)
    return iu[..., 0] | (iu[..., 1] << 8) | (iu[..., 2] << 16) | (mu << 24)


def _unpack_rgbm_u32(v: jax.Array):
    rgb = jnp.stack(
        [v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF], axis=-1
    ).astype(jnp.float32)
    return rgb, ((v >> 24) & 0x1).astype(jnp.float32)


def _ssr_apply_block(images: jax.Array, masks: jax.Array, angle: jax.Array,
                     scale: jax.Array, shift: jax.Array):
    """Block warp: ONE gather per 2×2 output block (¼ the indices).

    The TPU gather is per-index bound (~7 ns/index end-to-end; payload width
    is nearly free — bench_variants round 2), so the warp's cost is set by
    index count alone. Within a 2×2 output block the source coordinates
    spread by at most ``scale·√2 ≈ 1.56`` px (scale ≤ 1.1), so all four
    pixels' bilinear taps live inside one 4×4 source patch. The patch is
    packed as 16 uint32 channels (RGB+mask bit-packed, offsets (dy,dx) ∈
    0..3²) and fetched with a single per-block index at the patch origin
    ``(min y0, min x0)``; per-pixel taps are then separable 4-way selects.

    Interior pixels are bit-exact vs ``_ssr_apply``; pixels whose block
    straddling a fold is still exact because BOTH taps' reflected indices
    are computed per pixel and mapped into the patch — the block warp
    matches the exact cv2-semantics sampler (``_affine_sample``) at every
    pixel (pinned by ``tests/test_augment.py``), unlike the previous
    shifted-copy packing which deviated ±1 px at borders.
    """
    b, h, w, c = images.shape
    assert h % 2 == 0 and w % 2 == 0 and min(h, w) >= 4, (
        f"the 2×2-block warp needs even H/W ≥ 4, got {h}×{w} "
        "(pick an even data.img_size)")
    a_inv, t_inv = jax.vmap(
        lambda an, sc, dx, dy: _rotation_matrix(an, sc, dx, dy, h, w)
    )(angle, scale, shift[:, 0], shift[:, 1])
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sx = (
        a_inv[:, 0, 0, None, None] * xs
        + a_inv[:, 0, 1, None, None] * ys
        + t_inv[:, 0, None, None]
    )
    sy = (
        a_inv[:, 1, 0, None, None] * xs
        + a_inv[:, 1, 1, None, None] * ys
        + t_inv[:, 1, None, None]
    )
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    # both taps' indices reflected EXACTLY (cv2 semantics) — unlike the
    # shifted-copy paths, the block warp needs no ±1 border approximation
    x0i = _reflect101(x0.astype(jnp.int32), w)
    x1i = _reflect101(x0.astype(jnp.int32) + 1, w)
    y0i = _reflect101(y0.astype(jnp.int32), h)
    y1i = _reflect101(y0.astype(jnp.int32) + 1, h)

    # patch origin per 2×2 block: min over the 4 pixels' tap indices
    def block_min(a):
        a4 = a.reshape(b, h // 2, 2, w // 2, 2)
        return jnp.min(jnp.min(a4, axis=4), axis=2)  # (B, H/2, W/2)

    bx = jnp.minimum(block_min(jnp.minimum(x0i, x1i)), w - 4)
    by = jnp.minimum(block_min(jnp.minimum(y0i, y1i)), h - 4)
    # per-pixel patch column/row of each tap (0..3; the clip never engages
    # for the recipe's parameter ranges — tap spread within a block is ≤ 3)
    up = lambda a: jnp.repeat(jnp.repeat(a, 2, axis=1), 2, axis=2)
    bxp, byp = up(bx), up(by)
    ox0 = jnp.clip(x0i - bxp, 0, 3)
    ox1 = jnp.clip(x1i - bxp, 0, 3)
    oy0 = jnp.clip(y0i - byp, 0, 3)
    oy1 = jnp.clip(y1i - byp, 0, 3)

    # 16 patch channels: value at (y+dy, x+dx), via chained reflect-shifts
    base = _pack_rgbm_u32(images, masks)[..., None]  # (B,H,W,1) u32
    xsh = [base]
    for _ in range(3):
        xsh.append(_shift_reflect(xsh[-1], 2))
    rows = [xsh]
    for _ in range(1, 4):
        rows.append([_shift_reflect(t, 1) for t in rows[-1]])
    packed = jnp.concatenate(
        [t for row in rows for t in row], axis=-1
    )  # (B,H,W,16) u32, channel dy*4+dx

    flat = packed.reshape(b, h * w, 16)
    bidx = (by * w + bx).reshape(b, (h // 2) * (w // 2), 1)
    patch = jnp.take_along_axis(flat, bidx, axis=1).reshape(
        b, h // 2, w // 2, 16
    )

    # separable per-pixel tap weights over the 4 patch columns/rows
    wx = [
        (ox0 == k).astype(jnp.float32) * (1.0 - fx)
        + (ox1 == k).astype(jnp.float32) * fx
        for k in range(4)
    ]
    wy = [
        (oy0 == k).astype(jnp.float32) * (1.0 - fy)
        + (oy1 == k).astype(jnp.float32) * fy
        for k in range(4)
    ]
    nxi = jnp.where(fx >= 0.5, ox1, ox0)
    nyi = jnp.where(fy >= 0.5, oy1, oy0)

    out_img = jnp.zeros((b, h, w, c), jnp.float32)
    out_mask = jnp.zeros((b, h, w), jnp.float32)
    for dy in range(4):
        for dx in range(4):
            rgb, m = _unpack_rgbm_u32(patch[..., dy * 4 + dx])
            rgb_px = up(rgb)  # (B,H,W,3) broadcast block → pixels
            m_px = up(m)
            wgt = wy[dy] * wx[dx]
            out_img = out_img + wgt[..., None] * rgb_px
            near = ((nyi == dy) & (nxi == dx)).astype(jnp.float32)
            out_mask = out_mask + near * m_px
    return out_img, out_mask


def _ssr_batch(images: jax.Array, masks: jax.Array, key: jax.Array):
    """ShiftScaleRotate (p=0.5, albumentations 1.1 default ranges) on a
    batch: sample per-sample params, then the single-gather warp."""
    b = images.shape[0]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    apply = jax.random.bernoulli(k1, 0.5, (b,))
    angle = jnp.where(
        apply, jax.random.uniform(k2, (b,), minval=-45.0, maxval=45.0), 0.0
    )
    scale = jnp.where(
        apply, 1.0 + jax.random.uniform(k3, (b,), minval=-0.1, maxval=0.1), 1.0
    )
    shift = jnp.where(
        apply[:, None],
        jax.random.uniform(k4, (b, 2), minval=-0.0625, maxval=0.0625),
        jnp.zeros((b, 2)),
    )
    return _ssr_apply_block(images, masks, angle, scale, shift)


def augment_batch(
    key: jax.Array,
    images: jax.Array,  # (B, H, W, 3) float32, 0..255 scale
    masks: jax.Array,  # (B, H, W) float32 {0,1}
) -> Tuple[jax.Array, jax.Array]:
    """Train-time augmentation. Returns (normalized images, labels (B,H,W,1))."""
    b = images.shape[0]
    k_noise, k_napply, k_h, k_v, k_ssr, k_bc = jax.random.split(key, 6)

    # GaussNoise (p=0.5, var ~ U(10, 50)); per-pixel bits from the fast hash
    var = jax.random.uniform(
        jax.random.fold_in(k_noise, 1), (b, 1, 1, 1), minval=10.0, maxval=50.0
    )
    noise = fast_normal(_seed_from_key(k_noise), images.shape) * jnp.sqrt(var)
    apply_n = jax.random.bernoulli(k_napply, 0.5, (b, 1, 1, 1))
    # albumentations preserves uint8 dtype: GaussNoise adds float noise, then
    # clips and CASTS BACK to uint8 (truncation). The floor reproduces that
    # and guarantees integer-valued pixels for the packed warp below.
    images = jnp.floor(jnp.clip(images + jnp.where(apply_n, noise, 0.0),
                                0.0, 255.0))

    # flips (p=0.5 each)
    fh = jax.random.bernoulli(k_h, 0.5, (b, 1, 1, 1))
    fv = jax.random.bernoulli(k_v, 0.5, (b, 1, 1, 1))
    images = jnp.where(fh, images[:, :, ::-1], images)
    images = jnp.where(fv, images[:, ::-1], images)
    fmh, fmv = fh[..., 0], fv[..., 0]
    masks = jnp.where(fmh, masks[:, :, ::-1], masks)
    masks = jnp.where(fmv, masks[:, ::-1], masks)

    # ShiftScaleRotate (p=0.5), single-gather batched warp
    images, masks = _ssr_batch(images, masks, k_ssr)

    # RandomBrightnessContrast (p=0.5)
    kb1, kb2, kb3 = jax.random.split(k_bc, 3)
    apply_bc = jax.random.bernoulli(kb1, 0.5, (b, 1, 1, 1))
    alpha = 1.0 + jax.random.uniform(kb2, (b, 1, 1, 1), minval=-0.2, maxval=0.2)
    beta = jax.random.uniform(kb3, (b, 1, 1, 1), minval=-0.2, maxval=0.2)
    bc = jnp.clip(images * alpha + beta * 255.0, 0.0, 255.0)
    images = jnp.where(apply_bc, bc, images)

    labels = (masks > 0.5).astype(jnp.float32)[..., None]
    return normalize(images), labels


def eval_transform(images: jax.Array, masks: jax.Array):
    """Eval path: normalize only (resize happened at load time, mirroring the
    reference's eval ``A.Compose([Resize])``)."""
    labels = (masks > 0.5).astype(jnp.float32)[..., None]
    return normalize(images), labels
