"""SwinUnet comparator (C19): shifted-window transformer U-Net.

Reference: ``Models/Transformer/SwinUnet.py`` — vendored Swin-Unet with
encoder depths [2,2,6,2], heads [3,6,12,24], embed 96, window 8 at 256²
(wrapper ``:751-833``, trainer call ``multi_train_BASE.py:88``), patch-merging
downsample, PatchExpand upsample, skip concat + linear reduction, final ×4
patch expand and 1×1 conv head.

TPU-first: window partitioning is pure static reshapes, the cyclic shift is
``jnp.roll``, the shifted-window attention mask and relative-position index
are numpy constants baked at trace time, and attention runs as one batched
(B·nW, heads, 64, 64) matmul chain on the MXU.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mdvit_tpu.models.registry import register_model
from mdvit_tpu.ops.layers import DropPath, Mlp, conv2d, dense
from mdvit_tpu.ops.norm import DomainLayerNorm


def _rel_pos_index(window: int) -> np.ndarray:
    """Relative position index (wh·ww, wh·ww) into the (2w-1)² bias table."""
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), indexing="ij")
    )  # (2, w, w)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, n, n)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)  # (n, n)


def _shift_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows: (nW, n, n) with 0 / -100."""
    img_mask = np.zeros((h, w))
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    cnt = 0
    for hs in slices:
        for ws in slices:
            img_mask[hs, ws] = cnt
            cnt += 1
    mw = img_mask.reshape(h // window, window, w // window, window)
    mw = mw.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jax.Array, window: int) -> jax.Array:
    """(B, H, W, C) → (B·nW, window², C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def window_reverse(x: jax.Array, window: int, h: int, w: int) -> jax.Array:
    b = x.shape[0] // ((h // window) * (w // window))
    x = x.reshape(b, h // window, w // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (``SwinUnet.py:61-157``)."""

    dim: int
    window: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: np.ndarray | None = None,
                 train: bool = False) -> jax.Array:
        bw, n, c = x.shape
        h = self.num_heads
        ch = c // h
        scale = ch ** -0.5
        qkv = dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, h, ch).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        table = self.param(
            "relative_position_bias_table",
            lambda key, shape: 0.02 * jax.random.normal(key, shape),
            ((2 * self.window - 1) ** 2, h),
        )
        idx = _rel_pos_index(self.window).reshape(-1)
        bias = table[idx].reshape(n, n, h).transpose(2, 0, 1)  # (h, n, n)

        attn = jnp.einsum(
            "bhnk,bhmk->bhnm", q * scale, k,
            preferred_element_type=jnp.float32,
        )
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            m = jnp.asarray(mask)[None, :, None]  # (1, nW, 1, n, n)
            attn = attn.reshape(bw // nw, nw, h, n, n) + m
            attn = attn.reshape(bw, h, n, n)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            v.dtype
        )
        out = jnp.einsum("bhnm,bhmv->bhnv", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
        return dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    """LN → (S)W-MSA → +droppath → LN → MLP → + (``SwinUnet.py:158-284``)."""

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hres, wres = self.input_resolution
        window, shift = self.window, self.shift
        if min(hres, wres) <= window:
            window, shift = min(hres, wres), 0
        b, n, c = x.shape
        shortcut = x
        x = DomainLayerNorm(c, dtype=self.dtype, name="norm1")(x)
        x = x.reshape(b, hres, wres, c)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        xw = window_partition(x, window)
        mask = (
            _shift_attn_mask(hres, wres, window, shift) if shift > 0 else None
        )
        xw = WindowAttention(
            dim=self.dim, window=window, num_heads=self.num_heads,
            dtype=self.dtype, name="attn",
        )(xw, mask, train)
        x = window_reverse(xw, window, hres, wres)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x.reshape(b, n, c)
        x = shortcut + DropPath(self.drop_path, name="drop_path1")(x, train)

        cur = DomainLayerNorm(c, dtype=self.dtype, name="norm2")(x)
        cur = Mlp(hidden_features=int(c * self.mlp_ratio), drop=self.drop,
                  dtype=self.dtype, name="mlp")(cur, train)
        return x + DropPath(self.drop_path, name="drop_path2")(cur, train)


class PatchMerging(nn.Module):
    """2×2 neighbour concat → LN(4C) → Linear 4C→2C (``SwinUnet.py:285``)."""

    input_resolution: Tuple[int, int]
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h, w = self.input_resolution
        b, n, c = x.shape
        x = x.reshape(b, h, w, c)
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = x.reshape(b, (h // 2) * (w // 2), 4 * c)
        x = DomainLayerNorm(4 * c, dtype=self.dtype, name="norm")(x)
        return dense(2 * c, use_bias=False, dtype=self.dtype,
                     name="reduction")(x)


class PatchExpand(nn.Module):
    """Linear C→2C → pixel-shuffle ×2 → LN(C/2) (``SwinUnet.py:332``)."""

    input_resolution: Tuple[int, int]
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h, w = self.input_resolution
        b, n, c = x.shape
        x = dense(2 * c, use_bias=False, dtype=self.dtype, name="expand")(x)
        x = x.reshape(b, h, w, 2, 2, c // 2)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h * 2 * w, c // 2)
        return DomainLayerNorm(c // 2, dtype=self.dtype, name="norm")(x)


class FinalPatchExpandX4(nn.Module):
    """Linear C→16C → pixel-shuffle ×4 → LN(C) (``SwinUnet.py:356``)."""

    input_resolution: Tuple[int, int]
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h, w = self.input_resolution
        b, n, c = x.shape
        x = dense(16 * c, use_bias=False, dtype=self.dtype, name="expand")(x)
        x = x.reshape(b, h, w, 4, 4, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 4 * h * 4 * w, c)
        return DomainLayerNorm(c, dtype=self.dtype, name="norm")(x)


class SwinUnet(nn.Module):
    """Full Swin-Unet (``SwinUnet.py:554-833``). Input NHWC, logits NHWC."""

    img_size: int = 256
    patch_size: int = 4
    num_classes: int = 1
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 8
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, domain_onehot=None, train: bool = False,
                 out_seg: bool = True):
        res0 = self.img_size // self.patch_size
        dims = [self.embed_dim * 2 ** i for i in range(4)]
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))

        # patch embed: 4×4 stride-4 conv + LN
        x = conv2d(self.embed_dim, self.patch_size, self.patch_size, 0,
                   dtype=self.dtype, name="patch_embed")(x)
        b = x.shape[0]
        x = x.reshape(b, res0 * res0, self.embed_dim)
        x = DomainLayerNorm(self.embed_dim, dtype=self.dtype,
                            name="patch_norm")(x)
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)

        # encoder
        skips = []
        for i in range(4):
            res = res0 // (2 ** i)
            skips.append(x)
            for j in range(self.depths[i]):
                x = SwinBlock(
                    dim=dims[i], input_resolution=(res, res),
                    num_heads=self.num_heads[i], window=self.window,
                    shift=0 if j % 2 == 0 else self.window // 2,
                    mlp_ratio=self.mlp_ratio, drop=self.drop_rate,
                    drop_path=float(dpr[sum(self.depths[:i]) + j]),
                    dtype=self.dtype, name=f"layer{i}_block{j}",
                )(x, train)
            if i < 3:
                x = PatchMerging((res, res), dims[i], dtype=self.dtype,
                                 name=f"downsample{i}")(x, train)
        x = DomainLayerNorm(dims[3], dtype=self.dtype, name="norm")(x)
        feat = jnp.mean(x, axis=1)
        if not out_seg:
            return {"seg": None, "feat": feat}

        # decoder
        for i in range(4):
            li = 3 - i  # encoder layer index at this scale
            res = res0 // (2 ** li)
            if i == 0:
                x = PatchExpand((res, res), dims[li], dtype=self.dtype,
                                name="up0")(x, train)
            else:
                x = jnp.concatenate([x, skips[li]], axis=-1)
                x = dense(dims[li], dtype=self.dtype,
                          name=f"concat_back_dim{i}")(x)
                for j in range(self.depths[li]):
                    x = SwinBlock(
                        dim=dims[li], input_resolution=(res, res),
                        num_heads=self.num_heads[li], window=self.window,
                        shift=0 if j % 2 == 0 else self.window // 2,
                        mlp_ratio=self.mlp_ratio, drop=self.drop_rate,
                        drop_path=float(dpr[sum(self.depths[:li]) + j]),
                        dtype=self.dtype, name=f"up{i}_block{j}",
                    )(x, train)
                if i < 3:
                    x = PatchExpand((res, res), dims[li], dtype=self.dtype,
                                    name=f"up{i}_expand")(x, train)
        x = DomainLayerNorm(self.embed_dim, dtype=self.dtype,
                            name="norm_up")(x)
        x = FinalPatchExpandX4((res0, res0), self.embed_dim,
                               dtype=self.dtype, name="final_expand")(x, train)
        x = x.reshape(b, self.img_size, self.img_size, self.embed_dim)
        logits = conv2d(self.num_classes, 1, 1, 0, use_bias=False,
                        dtype=self.dtype, name="output")(x)
        return {"seg": logits, "feat": feat}


@register_model("SwinUnet")
def build_swin_unet(img_size=256, num_domains=4, adapt_method=None,
                    dtype=jnp.float32, **kw):
    """Trainer parity: ``SwinUnet(img_size, window_size=8)``
    (``multi_train_BASE.py:88``)."""
    kw.pop("decoder_name", None)
    return SwinUnet(img_size=img_size, window=8, dtype=dtype, **kw)


class SwinClassifier(nn.Module):
    """Swin Transformer classification backbone (C30,
    ``Models/Transformer/Swin_transformer.py:478-601``): patch embed + LN →
    optional absolute pos embed → 4 BasicLayers (SwinBlocks + PatchMerging
    between stages) → LN → token-mean pool → linear head.

    Shares ``SwinBlock``/``PatchMerging`` with the SwinUnet encoder — the
    reference vendors a second full copy of the Swin machinery; here the
    classifier is a thin composition over the same substrate.
    """

    img_size: int = 224
    patch_size: int = 4
    num_classes: int = 1000
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    ape: bool = False
    patch_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        res0 = self.img_size // self.patch_size
        dims = [self.embed_dim * 2 ** i for i in range(4)]
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))

        x = conv2d(self.embed_dim, self.patch_size, self.patch_size, 0,
                   dtype=self.dtype, name="patch_embed")(x)
        b = x.shape[0]
        x = x.reshape(b, res0 * res0, self.embed_dim)
        if self.patch_norm:
            x = DomainLayerNorm(self.embed_dim, dtype=self.dtype,
                                name="patch_norm")(x)
        if self.ape:
            pe = self.param(
                "absolute_pos_embed",
                lambda key, shape: 0.02 * jax.random.truncated_normal(
                    key, -2.0, 2.0, shape),
                (1, res0 * res0, self.embed_dim),
            )
            x = x + pe.astype(x.dtype)
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)

        for i in range(4):
            res = res0 // (2 ** i)
            for j in range(self.depths[i]):
                x = SwinBlock(
                    dim=dims[i], input_resolution=(res, res),
                    num_heads=self.num_heads[i], window=self.window,
                    shift=0 if j % 2 == 0 else self.window // 2,
                    mlp_ratio=self.mlp_ratio, drop=self.drop_rate,
                    drop_path=float(dpr[sum(self.depths[:i]) + j]),
                    dtype=self.dtype, name=f"layer{i}_block{j}",
                )(x, train)
            if i < 3:
                x = PatchMerging((res, res), dims[i], dtype=self.dtype,
                                 name=f"downsample{i}")(x, train)

        x = DomainLayerNorm(dims[3], dtype=self.dtype, name="norm")(x)
        feat = jnp.mean(x, axis=1)  # avgpool over tokens (:592)
        logits = (dense(self.num_classes, dtype=self.dtype, name="head")(feat)
                  if self.num_classes > 0 else feat)
        return {"logits": logits, "feat": feat}


@register_model("swin_tiny")
def build_swin_tiny(img_size=224, num_domains=4, adapt_method=None,
                    num_classes=1000, dtype=jnp.float32, **kw):
    """Swin-T config as vendored (embed 96, depths [2,2,6,2], window 7)."""
    kw.pop("decoder_name", None)
    return SwinClassifier(img_size=img_size, num_classes=num_classes,
                          dtype=dtype, **kw)
