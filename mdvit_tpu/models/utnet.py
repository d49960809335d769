"""UTNet comparator (C21/C22): hybrid CNN/transformer U-Net.

Reference: ``Models/Hybrid_models/UTNetFolder/`` — pre-activation residual
conv blocks (``unet_utils.py:156``), transformer blocks whose K/V are
downsampled to a fixed ``reduce_size``² before full softmax attention
(``conv_trans_utils.py:150-215``), cross-attention decoder blocks (q =
high-res, kv = low-res, ``:217-282``), and a Swin-style 2-D relative position
bias expanded from reduce_size to the query grid (``:344-380``).

Trainer config (``multi_train_BASE.py:82-85``): base_chan 32, block_list
'1234', num_blocks [1,1,1,1], heads 4, reduce_size 8, interp projection,
attn/proj drop 0.1, rel_pos, maxpool.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mdvit_tpu.models.registry import register_model
from mdvit_tpu.ops.layers import FastDropout, NormSpec, conv2d, make_bn
from mdvit_tpu.ops.resize import resize_bilinear_align_corners


def _bn(c, dtype, name):
    return make_bn(c, NormSpec(), dtype, name=name)


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


class DWSepConv(nn.Module):
    """depthwise_separable_conv (``conv_trans_utils.py:14-24``), no bias."""

    out_ch: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        x = conv2d(in_ch, self.kernel, 1, (self.kernel - 1) // 2,
                   groups=in_ch, use_bias=False, dtype=self.dtype,
                   name="depthwise")(x)
        return conv2d(self.out_ch, 1, 1, 0, use_bias=False, dtype=self.dtype,
                      name="pointwise")(x)


class BasicBlock(nn.Module):
    """Pre-activation residual block (``conv_trans_utils.py:47-77``)."""

    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inplanes = x.shape[-1]
        residue = x
        out = _bn(inplanes, self.dtype, "bn1")(x, None, not train)
        out = jax.nn.relu(out)
        out = conv2d(self.planes, 3, self.stride, 1, use_bias=False,
                     dtype=self.dtype, name="conv1")(out)
        out = _bn(self.planes, self.dtype, "bn2")(out, None, not train)
        out = jax.nn.relu(out)
        out = conv2d(self.planes, 3, 1, 1, use_bias=False, dtype=self.dtype,
                     name="conv2")(out)
        if self.stride != 1 or inplanes != self.planes:
            sc = _bn(inplanes, self.dtype, "shortcut_bn")(residue, None,
                                                          not train)
            sc = jax.nn.relu(sc)
            residue = conv2d(self.planes, 1, self.stride, 0, use_bias=False,
                             dtype=self.dtype, name="shortcut_conv")(sc)
        return out + residue


class RelativePositionBias(nn.Module):
    """2-D relative position bias over (reduce², reduce²), repeated up to the
    query grid (``conv_trans_utils.py:344-380``)."""

    num_heads: int
    size: int  # reduce_size (h == w)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hq: int, wq: int) -> jax.Array:
        s = self.size
        table = self.param(
            "relative_position_bias_table",
            lambda key, shape: 0.02 * jax.random.normal(key, shape),
            ((2 * s - 1) * (2 * s - 1), self.num_heads),
        )
        coords = np.stack(
            np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
        ).reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.transpose(1, 2, 0)
        rel[:, :, 0] += s - 1
        rel[:, :, 1] += s - 1
        rel[:, :, 0] *= 2 * s - 1
        idx = rel.sum(-1).reshape(-1)
        bias = table[idx].reshape(s, s, s * s, self.num_heads)
        bias = jnp.repeat(bias, hq // s, axis=0)
        bias = jnp.repeat(bias, wq // s, axis=1)  # (Hq, Wq, s², heads)
        return bias.reshape(hq * wq, s * s, self.num_heads).transpose(2, 0, 1)


class LinearAttention(nn.Module):
    """Full softmax attention with K/V pooled to reduce_size²
    (``conv_trans_utils.py:150-215``)."""

    dim: int
    heads: int = 4
    reduce_size: int = 8
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    rel_pos: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        heads = self.heads
        dim_head = c // heads
        inner = dim_head * heads
        rs = self.reduce_size
        qkv = DWSepConv(inner * 3, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if h != rs:
            k = resize_bilinear_align_corners(k, (rs, rs))
            v = resize_bilinear_align_corners(v, (rs, rs))
        # channel layout '(dim_head heads)': dim_head-major
        q = q.reshape(b, h * w, dim_head, heads).transpose(0, 3, 1, 2)
        k = k.reshape(b, rs * rs, dim_head, heads).transpose(0, 3, 1, 2)
        v = v.reshape(b, rs * rs, dim_head, heads).transpose(0, 3, 1, 2)
        attn = jnp.einsum("bhid,bhjd->bhij", q, k,
                          preferred_element_type=jnp.float32)
        if self.rel_pos:
            attn = attn + RelativePositionBias(
                heads, rs, dtype=self.dtype, name="rel_pos")(h, w)[None]
        attn = attn * (dim_head ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = FastDropout(self.attn_drop, name="attn_drop")(attn, train)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.transpose(0, 2, 3, 1).reshape(b, h, w, inner)
        out = DWSepConv(self.dim, dtype=self.dtype, name="to_out")(out)
        return FastDropout(self.proj_drop, name="proj_drop")(out, train)


class LinearAttentionDecoder(nn.Module):
    """Cross attention: q from high-res, k/v from pooled low-res
    (``conv_trans_utils.py:217-282``)."""

    out_dim: int
    heads: int = 4
    reduce_size: int = 8
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    rel_pos: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_feat, kv_feat, train: bool = False):
        b, hh, wh, _ = q_feat.shape
        heads = self.heads
        dim_head = self.out_dim // heads
        inner = dim_head * heads
        rs = self.reduce_size
        kv = DWSepConv(inner * 2, dtype=self.dtype, name="to_kv")(kv_feat)
        k, v = jnp.split(kv, 2, axis=-1)
        q = DWSepConv(inner, dtype=self.dtype, name="to_q")(q_feat)
        if kv_feat.shape[1] != rs:
            k = resize_bilinear_align_corners(k, (rs, rs))
            v = resize_bilinear_align_corners(v, (rs, rs))
        q = q.reshape(b, hh * wh, dim_head, heads).transpose(0, 3, 1, 2)
        k = k.reshape(b, rs * rs, dim_head, heads).transpose(0, 3, 1, 2)
        v = v.reshape(b, rs * rs, dim_head, heads).transpose(0, 3, 1, 2)
        attn = jnp.einsum("bhid,bhjd->bhij", q, k,
                          preferred_element_type=jnp.float32)
        if self.rel_pos:
            attn = attn + RelativePositionBias(
                heads, rs, dtype=self.dtype, name="rel_pos")(hh, wh)[None]
        attn = attn * (dim_head ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = FastDropout(self.attn_drop, name="attn_drop")(attn, train)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(
            q_feat.dtype)
        out = out.transpose(0, 2, 3, 1).reshape(b, hh, wh, inner)
        out = DWSepConv(self.out_dim, dtype=self.dtype, name="to_out")(out)
        return FastDropout(self.proj_drop, name="proj_drop")(out, train)


class BasicTransBlock(nn.Module):
    """BN → attn → +x → BN → relu → 1×1 conv → + (``conv_trans_utils.py:80``)."""

    in_ch: int
    heads: int
    reduce_size: int = 8
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    rel_pos: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = _bn(self.in_ch, self.dtype, "bn1")(x, None, not train)
        out = LinearAttention(
            dim=self.in_ch, heads=self.heads, reduce_size=self.reduce_size,
            attn_drop=self.attn_drop, proj_drop=self.proj_drop,
            rel_pos=self.rel_pos, dtype=self.dtype, name="attn",
        )(out, train)
        out = out + x
        residue = out
        out = _bn(self.in_ch, self.dtype, "bn2")(out, None, not train)
        out = jax.nn.relu(out)
        out = conv2d(self.in_ch, 1, 1, 0, use_bias=False, dtype=self.dtype,
                     name="mlp")(out)
        return out + residue


class BasicTransDecoderBlock(nn.Module):
    """Cross-attn decoder block (``conv_trans_utils.py:109-146``)."""

    in_ch: int
    out_ch: int
    heads: int
    reduce_size: int = 8
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    rel_pos: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        # x1: low-res, x2: high-res
        residue = resize_bilinear_align_corners(
            conv2d(self.out_ch, 1, 1, 0, dtype=self.dtype, name="conv_ch")(x1),
            (x2.shape[1], x2.shape[2]),
        )
        x1n = _bn(self.in_ch, self.dtype, "bn_l")(x1, None, not train)
        x2n = _bn(self.out_ch, self.dtype, "bn_h")(x2, None, not train)
        out = LinearAttentionDecoder(
            out_dim=self.out_ch, heads=self.heads,
            reduce_size=self.reduce_size, attn_drop=self.attn_drop,
            proj_drop=self.proj_drop, rel_pos=self.rel_pos, dtype=self.dtype,
            name="attn",
        )(x2n, x1n, train)
        out = out + residue
        residue = out
        out = _bn(self.out_ch, self.dtype, "bn2")(out, None, not train)
        out = jax.nn.relu(out)
        out = conv2d(self.out_ch, 1, 1, 0, use_bias=False, dtype=self.dtype,
                     name="mlp")(out)
        return out + residue


class UTNet(nn.Module):
    """Full UTNet with the trainer's block_list='1234' wiring."""

    base_chan: int = 32
    num_classes: int = 1
    reduce_size: int = 8
    num_blocks: Sequence[int] = (1, 1, 1, 1)
    num_heads: Sequence[int] = (4, 4, 4, 4)
    attn_drop: float = 0.1
    proj_drop: float = 0.1
    rel_pos: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, domain_onehot=None, train: bool = False,
                 out_seg: bool = True):
        bc = self.base_chan
        kw = dict(reduce_size=self.reduce_size, attn_drop=self.attn_drop,
                  proj_drop=self.proj_drop, rel_pos=self.rel_pos,
                  dtype=self.dtype)

        # inc: BasicBlock(3→32) + BasicBlock(32→32) (block_list has no '0')
        x1 = BasicBlock(bc, dtype=self.dtype, name="inc0")(x, train)
        x1 = BasicBlock(bc, dtype=self.dtype, name="inc1")(x1, train)

        def down(name, out_ch, heads, num_block, xin):
            out = _maxpool2(xin)
            out = BasicBlock(out_ch, dtype=self.dtype,
                             name=f"{name}_conv")(out, train)
            for i in range(num_block):
                out = BasicTransBlock(out_ch, heads, name=f"{name}_t{i}",
                                      **kw)(out, train)
            return out

        x2 = down("down1", 2 * bc, self.num_heads[0], self.num_blocks[0], x1)
        x3 = down("down2", 4 * bc, self.num_heads[1], self.num_blocks[1], x2)
        x4 = down("down3", 8 * bc, self.num_heads[2], self.num_blocks[2], x3)
        x5 = down("down4", 16 * bc, self.num_heads[3], self.num_blocks[3], x4)

        feat = jnp.mean(x5, axis=(1, 2))
        if not out_seg:
            return {"seg": None, "feat": feat}

        def up_trans(name, in_ch, out_ch, heads, x_lo, x_hi):
            out = BasicTransDecoderBlock(
                in_ch, out_ch, heads, name=f"{name}_attn", **kw
            )(x_lo, x_hi, train)
            out = jnp.concatenate([out, x_hi], axis=-1)
            return BasicBlock(out_ch, dtype=self.dtype,
                              name=f"{name}_conv")(out, train)

        out = up_trans("up1", 16 * bc, 8 * bc, self.num_heads[3], x5, x4)
        out = up_trans("up2", 8 * bc, 4 * bc, self.num_heads[2], out, x3)
        out = up_trans("up3", 4 * bc, 2 * bc, self.num_heads[1], out, x2)

        # up4: pure-conv up_block (no '0' in block_list, unet_utils.py:280)
        up = resize_bilinear_align_corners(
            out, (out.shape[1] * 2, out.shape[2] * 2))
        up = conv2d(bc, 1, 1, 0, dtype=self.dtype, name="up4_conv_ch")(up)
        out = jnp.concatenate([x1, up], axis=-1)
        out = BasicBlock(bc, dtype=self.dtype, name="up4_conv")(out, train)

        logits = conv2d(self.num_classes, 1, 1, 0, dtype=self.dtype,
                        name="outc")(out)
        return {"seg": logits, "feat": feat}


@register_model("UTNet")
def build_utnet(img_size=256, num_domains=4, adapt_method=None,
                dtype=jnp.float32, **kw):
    kw.pop("decoder_name", None)
    return UTNet(dtype=dtype, **kw)
