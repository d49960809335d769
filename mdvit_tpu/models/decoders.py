"""Decoders: U-Net transformer decoding blocks and the MKD aux debranches.

Reference: ``Models/Decoders.py`` (UnetDecodingBlockTransformer :174, _M :121,
MLPDecoder :239, MLPDecoderFM :289, DeepLabV3Decoder :218) and ``Utils/_deeplab.py``
(ASPP :137). The "_M" per-domain-norm variants are folded into the plain
modules via ``NormSpec(dsn=True)``; per-domain *debranches* are stacked with
``nn.vmap`` by the model (models/mdvit.py) rather than cloned as four modules.

``img_size``/scales are static attributes so everything jits with fixed shapes.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mdvit_tpu.models.blocks import MHSAStage, grid_to_tokens, tokens_to_grid
from mdvit_tpu.ops.layers import (
    ConvBN,
    DWConvBN,
    Dropout2d,
    NormSpec,
    PointwiseConv,
    conv2d,
    make_bn,
)
from mdvit_tpu.ops.resize import resize_bilinear


class UnetDecodingBlockTransformer(nn.Module):
    """Upsample → 1×1 conv → concat(skip, ·) → DWConvBN → MHSA stage
    (``Decoders.py:174-214``; ``norm.dsn=True`` gives the ``_M`` variant).

    ``mhsa`` is constructed by the caller so its config (layers/heads/Sup)
    mirrors the encoder stage at the same scale (``mdvit.py:568-588``).
    """

    out_channels: int
    mhsa: MHSAStage
    use_res: bool = False
    norm: NormSpec = NormSpec()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        skip: jax.Array,
        domain_onehot: jax.Array | None = None,
        train: bool = False,
    ) -> jax.Array:
        skip_size = (skip.shape[1], skip.shape[2])
        # 1×1 conv and bilinear resize are both linear and commute exactly;
        # convolving BEFORE the ×2 upsample (reference order: Decoders.py:144-
        # 145 resizes first) quarters the conv's pixel count and halves HBM
        # traffic at identical math.
        out = conv2d(self.out_channels, 1, 1, 0, dtype=self.dtype,
                     name="conv_before")(x)
        out = resize_bilinear(out, skip_size)
        out = jnp.concatenate([skip, out], axis=-1)  # skip first (parity)
        # NB: the _M/DSN decoder uses Decoders.py's OWN DWConv2d_BN_M
        # (``Decoders.py:66-106``) — same dw 2C→C groups=C geometry as the
        # plain DWConv2d_BN, only the bns are per-domain. (mdvit.py:127 has a
        # different DWConv2d_BN_M, dw in→in, used only by DSN patch embeds.)
        out = DWConvBN(
            features=self.out_channels, kernel_size=3, dw_groups_on="out",
            norm=self.norm, dtype=self.dtype, name="conv_after",
        )(out, domain_onehot, train)
        if self.use_res:
            res = ConvBN(
                features=self.out_channels, kernel_size=1, padding=0,
                norm=self.norm, dtype=self.dtype, name="res_conv",
            )(out, domain_onehot, train)
        tokens = grid_to_tokens(out)
        tokens = self.mhsa(tokens, skip_size, domain_onehot, train)
        out2 = tokens_to_grid(tokens, skip_size)
        return res + out2 if self.use_res else out2


class MLPDecoder(nn.Module):
    """SegFormer-style aux decoder over the 4 encoder scales
    (``Decoders.py:239-287``)."""

    # All 1×1 heads lower as batched dots (PointwiseConv), so an nn.vmap
    # stack over domains stays GSPMD-partitionable without a sharding
    # constraint; classes with real spatial convs set this True (the vmapped
    # conv becomes a feature-grouped conv whose group dim GSPMD can't split).
    VMAP_GROUP_CONV = False

    hidden_channel: int = 256
    out_channel: int = 1
    img_size: Tuple[int, int] = (256, 256)
    dropout_ratio: float = 0.1
    norm: NormSpec = NormSpec()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        features: Sequence[jax.Array],
        domain_onehot: jax.Array | None = None,
        train: bool = False,
    ) -> jax.Array:
        x1 = features[0]
        h, w = x1.shape[1], x1.shape[2]
        outs = []
        # all convs here are 1×1 → PointwiseConv (matmul form) so the
        # nn.vmap-stacked debranch lowers to batched dots GSPMD can shard
        for i, f in enumerate(features[:4]):
            y = PointwiseConv(self.hidden_channel, dtype=self.dtype,
                              name=f"linear{i + 1}")(f)
            outs.append(resize_bilinear(y, (h, w)))
        out = jnp.concatenate(outs, axis=-1)
        out = PointwiseConv(self.hidden_channel, dtype=self.dtype,
                            name="fuse_conv")(out)
        out = make_bn(self.hidden_channel, self.norm, self.dtype,
                      name="fuse_bn")(out, domain_onehot,
                                      use_running_average=not train)
        out = jax.nn.relu(out)
        out = Dropout2d(self.dropout_ratio, name="dropout")(out, train)
        # linear_out (1×1) commutes with the bilinear upsample; applying it at
        # H/4 resizes 1 channel instead of `hidden_channel`
        out = PointwiseConv(self.out_channel, dtype=self.dtype,
                            name="linear_out")(out)
        return resize_bilinear(out, self.img_size)


class MLPDecoderFM(nn.Module):
    """MLPDecoder + the universal decoder's H/4 feature map fused into the
    concat (``Decoders.py:289-339``) — the default MDViT debranch."""

    VMAP_GROUP_CONV = False  # pure 1×1 heads, see MLPDecoder

    hidden_channel: int = 512
    out_channel: int = 1
    img_size: Tuple[int, int] = (256, 256)
    dropout_ratio: float = 0.1
    norm: NormSpec = NormSpec()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        features: Sequence[jax.Array],  # [s0, s1, s2, s3, uni_decoder_out]
        domain_onehot: jax.Array | None = None,
        train: bool = False,
    ) -> jax.Array:
        x1, x5 = features[0], features[4]
        h, w = x1.shape[1], x1.shape[2]
        outs = []
        # all convs here are 1×1 → PointwiseConv (matmul form) so the
        # nn.vmap-stacked debranch lowers to batched dots GSPMD can shard
        for i, f in enumerate(features[:4]):
            y = PointwiseConv(self.hidden_channel, dtype=self.dtype,
                              name=f"linear{i + 1}")(f)
            outs.append(resize_bilinear(y, (h, w)))
        outs.append(x5)  # raw universal-decoder feature, no projection
        out = jnp.concatenate(outs, axis=-1)  # 4·hidden + C(x5)
        out = PointwiseConv(self.hidden_channel, dtype=self.dtype,
                            name="fuse_conv")(out)
        out = make_bn(self.hidden_channel, self.norm, self.dtype,
                      name="fuse_bn")(out, domain_onehot,
                                      use_running_average=not train)
        out = jax.nn.relu(out)
        out = Dropout2d(self.dropout_ratio, name="dropout")(out, train)
        out = PointwiseConv(self.out_channel, dtype=self.dtype,
                            name="linear_out")(out)  # commutes with resize
        return resize_bilinear(out, self.img_size)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (``Utils/_deeplab.py:137-166``):
    1×1 + three dilated 3×3 branches + global-pool branch → project 5·256→256.
    """

    out_channels: int = 256
    rates: Tuple[int, int, int] = (6, 12, 18)
    norm: NormSpec = NormSpec()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, domain_onehot=None, train: bool = False):
        c = self.out_channels
        size = (x.shape[1], x.shape[2])
        branches = []

        def conv_bn_relu(y, k, dil, name):
            y = conv2d(c, k, 1, padding=(k - 1) // 2 * dil, dilation=dil,
                       use_bias=False, dtype=self.dtype, name=f"{name}_conv")(y)
            y = make_bn(c, self.norm, self.dtype, name=f"{name}_bn")(
                y, domain_onehot, use_running_average=not train)
            return jax.nn.relu(y)

        branches.append(conv_bn_relu(x, 1, 1, "b0"))
        for i, r in enumerate(self.rates):
            branches.append(conv_bn_relu(x, 3, r, f"b{i + 1}"))
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = conv_bn_relu(pooled, 1, 1, "pool")
        branches.append(jnp.broadcast_to(
            pooled, (x.shape[0], size[0], size[1], c)))

        out = jnp.concatenate(branches, axis=-1)
        out = conv2d(c, 1, 1, 0, use_bias=False, dtype=self.dtype,
                     name="project_conv")(out)
        out = make_bn(c, self.norm, self.dtype, name="project_bn")(
            out, domain_onehot, use_running_average=not train)
        out = jax.nn.relu(out)
        out = nn.Dropout(0.1, deterministic=not train)(out)
        return out


class DeepLabV3Decoder(nn.Module):
    """ASPP + conv head, the MDViT^D debranch (``Decoders.py:218-235``).
    Takes the last (H/32) encoder feature."""

    VMAP_GROUP_CONV = True  # ASPP 3×3 dilated convs, see MLPDecoder

    out_channel: int = 1
    img_size: Tuple[int, int] = (256, 256)
    norm: NormSpec = NormSpec()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        features,
        domain_onehot: jax.Array | None = None,
        train: bool = False,
    ) -> jax.Array:
        x = features[-1] if isinstance(features, (list, tuple)) else features
        x = ASPP(norm=self.norm, dtype=self.dtype, name="aspp")(
            x, domain_onehot, train)
        x = conv2d(256, 3, 1, 1, use_bias=False, dtype=self.dtype,
                   name="head_conv")(x)
        x = make_bn(256, self.norm, self.dtype, name="head_bn")(
            x, domain_onehot, use_running_average=not train)
        x = jax.nn.relu(x)
        x = conv2d(self.out_channel, 1, 1, 0, dtype=self.dtype,
                   name="head_out")(x)
        return resize_bilinear(x, self.img_size)
