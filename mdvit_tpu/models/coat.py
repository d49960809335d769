"""CoaT / CoaT-Lite classification backbones (C29).

Reference: ``Models/Transformer/coat.py`` — the vendored co-scale
conv-attentional transformer: per-scale serial blocks with CLS tokens
(CPE/CRPE skip the CLS row, ``coat.py:183-200,111-131``) and, for the CoaT
series, parallel blocks with cross-scale feature interpolation
(``:239-340``). Factories mirror ``coat_tiny/mini/small`` and
``coat_lite_tiny/mini/small/medium`` (``:688-726``).

``CoaTSeg`` (``coat.py:602``) references undefined symbols in the reference
(dead code, SURVEY §7.4) and is intentionally not reproduced; segmentation on
this substrate is BASE/MDViT.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mdvit_tpu.models.blocks import ConvPosEnc, ConvRelPosEnc
from mdvit_tpu.models.registry import register_model
from mdvit_tpu.ops.layers import Mlp, conv2d, dense
from mdvit_tpu.ops.norm import DomainLayerNorm
from mdvit_tpu.ops.pallas_attention import factorized_attention_xla
from mdvit_tpu.ops.resize import resize_bilinear


class FactorAttCls(nn.Module):
    """Factorized attention over [CLS; img] tokens; CRPE applies to the image
    tokens only (zero row for CLS)."""

    dim: int
    num_heads: int
    crpe: ConvRelPosEnc
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, size: Tuple[int, int], train: bool = False):
        b, n, c = x.shape
        ch = c // self.num_heads
        qkv = dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="qkv")(x)
        q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
        att = factorized_attention_xla(q, k, v, ch, ch ** -0.5).astype(q.dtype)
        crpe_img = self.crpe(q[:, 1:], v[:, 1:], size)  # (B, HW, C)
        crpe = jnp.concatenate(
            [jnp.zeros((b, 1, c), crpe_img.dtype), crpe_img], axis=1)
        out = att + crpe
        return dense(c, dtype=self.dtype, name="proj")(out)


class CoaTSerialBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    cpe: ConvPosEnc
    crpe: ConvRelPosEnc
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, size, train: bool = False):
        b, n, c = x.shape
        cls_tok, img = x[:, :1], x[:, 1:]
        img = self.cpe(img, size)
        x = jnp.concatenate([cls_tok, img], axis=1)
        cur = DomainLayerNorm(c, dtype=self.dtype, name="norm1")(x)
        cur = FactorAttCls(dim=self.dim, num_heads=self.num_heads,
                           crpe=self.crpe, dtype=self.dtype,
                           name="factoratt_crpe")(cur, size, train)
        x = x + cur
        cur = DomainLayerNorm(c, dtype=self.dtype, name="norm2")(x)
        cur = Mlp(hidden_features=int(c * self.mlp_ratio), dtype=self.dtype,
                  name="mlp")(cur, train)
        return x + cur


def _interp_tokens(x, size_in, size_out):
    """Bilinear interpolate image tokens, CLS passthrough (coat.py:285-298)."""
    b, n, c = x.shape
    cls_tok, img = x[:, :1], x[:, 1:]
    grid = img.reshape(b, size_in[0], size_in[1], c)
    grid = resize_bilinear(grid, size_out)
    return jnp.concatenate(
        [cls_tok, grid.reshape(b, size_out[0] * size_out[1], c)], axis=1)


class CoaT(nn.Module):
    """CoaT / CoaT-Lite classifier."""

    patch_size: int = 4
    num_classes: int = 1000
    embed_dims: Sequence[int] = (64, 128, 256, 320)
    serial_depths: Sequence[int] = (2, 2, 2, 2)
    parallel_depth: int = 0
    num_heads: int = 8
    mlp_ratios: Sequence[float] = (8, 8, 4, 4)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        dims = self.embed_dims
        self.cpes = [ConvPosEnc(dim=dims[i], k=3, dtype=self.dtype,
                                name=f"cpe{i + 1}") for i in range(4)]
        self.crpes = [
            ConvRelPosEnc(ch_per_head=dims[i] // self.num_heads,
                          num_heads=self.num_heads, window={3: 2, 5: 3, 7: 3},
                          dtype=self.dtype, name=f"crpe{i + 1}")
            for i in range(4)
        ]
        self.cls_tokens = [
            self.param(f"cls_token{i + 1}",
                       lambda key, shape: 0.02 * jax.random.normal(key, shape),
                       (1, 1, dims[i]))
            for i in range(4)
        ]
        self.patch_convs = [
            conv2d(dims[i], self.patch_size if i == 0 else 2,
                   self.patch_size if i == 0 else 2, 0, dtype=self.dtype,
                   name=f"patch_embed{i + 1}")
            for i in range(4)
        ]
        self.patch_norms = [
            DomainLayerNorm(dims[i], dtype=self.dtype,
                            name=f"patch_norm{i + 1}") for i in range(4)
        ]
        self.serials = [
            [CoaTSerialBlock(dim=dims[i], num_heads=self.num_heads,
                             mlp_ratio=self.mlp_ratios[i], cpe=self.cpes[i],
                             crpe=self.crpes[i], dtype=self.dtype,
                             name=f"serial{i + 1}_{j}")
             for j in range(self.serial_depths[i])]
            for i in range(4)
        ]
        if self.parallel_depth > 0:
            self.parallels = [
                _ParallelBlockImpl(
                    dim=dims[1], num_heads=self.num_heads,
                    mlp_ratio=self.mlp_ratios[1],
                    cpes=self.cpes, crpes=self.crpes, dtype=self.dtype,
                    name=f"parallel_{j}",
                )
                for j in range(self.parallel_depth)
            ]
        self.norm2_f = DomainLayerNorm(dims[1], dtype=self.dtype, name="norm2")
        self.norm3_f = DomainLayerNorm(dims[2], dtype=self.dtype, name="norm3")
        self.norm4_f = DomainLayerNorm(dims[3], dtype=self.dtype, name="norm4")
        self.head = dense(self.num_classes, dtype=self.dtype, name="head")
        if self.parallel_depth > 0:
            # Conv1d(3→1, k=1) over the stacked per-scale CLS tokens
            # (coat.py:470-471)
            self.agg_weight = self.param(
                "agg_weight",
                lambda key, shape: 0.02 * jax.random.normal(key, shape), (3,))
            self.agg_bias = self.param("agg_bias", nn.initializers.zeros, (1,))

    def __call__(self, x, domain_onehot=None, train: bool = False):
        b = x.shape[0]
        tokens = []
        sizes = []
        cur = x
        for i in range(4):
            g = self.patch_convs[i](cur)
            h, w = g.shape[1], g.shape[2]
            t = self.patch_norms[i](g.reshape(b, h * w, -1))
            t = jnp.concatenate(
                [jnp.broadcast_to(self.cls_tokens[i].astype(t.dtype),
                                  (b, 1, t.shape[-1])), t], axis=1)
            for blk in self.serials[i]:
                t = blk(t, (h, w), train)
            tokens.append(t)
            sizes.append((h, w))
            cur = t[:, 1:].reshape(b, h, w, -1)

        if self.parallel_depth == 0:
            x4 = self.norm4_f(tokens[3])
            return {"logits": self.head(x4[:, 0]), "feat": x4[:, 0]}

        x1, x2, x3, x4 = tokens
        for blk in self.parallels:
            x1, x2, x3, x4 = blk((x1, x2, x3, x4), sizes, train)
        cls2 = self.norm2_f(x2)[:, :1]
        cls3 = self.norm3_f(x3)[:, :1]
        cls4 = self.norm4_f(x4)[:, :1]
        stacked = jnp.concatenate([cls2, cls3, cls4], axis=1)  # (B, 3, C)
        merged = jnp.einsum("bsc,s->bc", stacked.astype(jnp.float32),
                            self.agg_weight.astype(jnp.float32)
                            ) + self.agg_bias
        return {"logits": self.head(merged.astype(stacked.dtype)),
                "feat": merged}


class _ParallelBlockImpl(nn.Module):
    """Exact reference parallel-block math (``coat.py:300-337``)."""

    dim: int
    num_heads: int
    mlp_ratio: float
    cpes: Sequence[ConvPosEnc]
    crpes: Sequence[ConvRelPosEnc]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, sizes, train: bool = False):
        x1, x2, x3, x4 = xs
        _, s2, s3, s4 = sizes
        c = self.dim

        def attend(x, size, idx):
            cls_tok, img = x[:, :1], x[:, 1:]
            img = self.cpes[idx](img, size)
            x = jnp.concatenate([cls_tok, img], axis=1)
            cur = DomainLayerNorm(c, dtype=self.dtype,
                                  name=f"norm1{idx + 1}")(x)
            cur = FactorAttCls(dim=c, num_heads=self.num_heads,
                               crpe=self.crpes[idx], dtype=self.dtype,
                               name=f"factoratt_crpe{idx + 1}")(cur, size,
                                                                train)
            return x, cur

        x2, cur2 = attend(x2, s2, 1)
        x3, cur3 = attend(x3, s3, 2)
        x4, cur4 = attend(x4, s4, 3)
        new2 = cur2 + _interp_tokens(cur3, s3, s2) + _interp_tokens(cur4, s4, s2)
        new3 = cur3 + _interp_tokens(cur4, s4, s3) + _interp_tokens(cur2, s2, s3)
        new4 = cur4 + _interp_tokens(cur3, s3, s4) + _interp_tokens(cur2, s2, s4)
        x2, x3, x4 = x2 + new2, x3 + new3, x4 + new4

        # shared MLP across scales (coat.py:271-274)
        mlp = Mlp(hidden_features=int(c * self.mlp_ratio), dtype=self.dtype,
                  name="mlp_shared")
        x2 = x2 + mlp(DomainLayerNorm(c, dtype=self.dtype, name="norm22")(x2),
                      train)
        x3 = x3 + mlp(DomainLayerNorm(c, dtype=self.dtype, name="norm23")(x3),
                      train)
        x4 = x4 + mlp(DomainLayerNorm(c, dtype=self.dtype, name="norm24")(x4),
                      train)
        return x1, x2, x3, x4


def _coat_factory(name, **cfg):
    @register_model(name)
    def build(img_size=224, num_domains=4, adapt_method=None,
              dtype=jnp.float32, num_classes=1000, **kw):
        kw.pop("decoder_name", None)
        return CoaT(num_classes=num_classes, dtype=dtype, **cfg, **kw)

    return build


_coat_factory("coat_tiny", embed_dims=(152, 152, 152, 152),
              serial_depths=(2, 2, 2, 2), parallel_depth=6,
              mlp_ratios=(4, 4, 4, 4))
_coat_factory("coat_mini", embed_dims=(152, 216, 216, 216),
              serial_depths=(2, 2, 2, 2), parallel_depth=6,
              mlp_ratios=(4, 4, 4, 4))
_coat_factory("coat_small", embed_dims=(152, 320, 320, 320),
              serial_depths=(2, 2, 2, 2), parallel_depth=6,
              mlp_ratios=(4, 4, 4, 4))
_coat_factory("coat_lite_tiny", embed_dims=(64, 128, 256, 320),
              serial_depths=(2, 2, 2, 2), parallel_depth=0,
              mlp_ratios=(8, 8, 4, 4))
_coat_factory("coat_lite_mini", embed_dims=(64, 128, 320, 512),
              serial_depths=(2, 2, 2, 2), parallel_depth=0,
              mlp_ratios=(8, 8, 4, 4))
_coat_factory("coat_lite_small", embed_dims=(64, 128, 320, 512),
              serial_depths=(3, 4, 6, 3), parallel_depth=0,
              mlp_ratios=(8, 8, 4, 4))
