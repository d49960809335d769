"""BASE: the factorized-attention U-Net without MKD debranches.

Reference: ``Models/Transformer/base.py:340-512`` (BASE) and ``:515-696``
(BASE_DSN, per-domain norms). Config: 4 stages, dims [64,128,320,512],
layers [2,2,2,2], heads 8, mlp_ratios [8,8,4,4], stem to H/4, bridge at H/32
(512→1024), 4 transformer decoding blocks back to H/4, 1×1 logit head.

The DSN variant is the same module with ``dsn=True`` (per-domain BatchNorm
affine+stats and per-domain LayerNorms selected by the one-hot, see
ops/norm.py); the "Sup" domain-adapter gate is ``adapt='Sup'``.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mdvit_tpu.models.blocks import MHSAStage, grid_to_tokens, tokens_to_grid
from mdvit_tpu.models.decoders import UnetDecodingBlockTransformer
from mdvit_tpu.models.registry import register_model
from mdvit_tpu.ops.layers import ConvBN, DWConvBN, NormSpec, conv2d, make_bn


class FATEncoderDecoder(nn.Module):
    """Shared stem → 4 encoder stages → bridge → 4 decoder blocks → H/4 feat.

    Used by BASE (plus a 1×1 head) and MDViT (plus MKD debranches).
    """

    img_size: int = 256
    in_chans: int = 3
    num_layers: Sequence[int] = (2, 2, 2, 2)
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    mlp_ratios: Sequence[float] = (8, 8, 4, 4)
    num_heads: Sequence[int] = (8, 8, 8, 8)
    qkv_bias: bool = True
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    adapt: str | None = None  # 'Sup' | None
    dsn: bool = False
    num_domains: int = 4
    bn_domain_stats: bool = True  # per-domain batch stats (reference parity)
    adapter: str | None = None  # None | 'DASE' | 'USE' (base_sota_adapt.py)
    dtype: jnp.dtype = jnp.float32

    def _norm_spec(self) -> NormSpec:
        return NormSpec(
            num_domains=self.num_domains,
            dsn=self.dsn,
            group_stats=self.bn_domain_stats,
        )

    def setup(self):
        dims = self.embed_dims
        spec = self._norm_spec()
        sup = self.adapt == "Sup"

        self.stem1 = ConvBN(dims[0] // 2, 3, 2, 1, act="hardswish",
                            norm=spec, dtype=self.dtype)
        self.stem2 = ConvBN(dims[0], 3, 2, 1, act="hardswish",
                            norm=spec, dtype=self.dtype)

        self.patch_embeds = [
            DWConvBN(
                features=dims[i], kernel_size=3,
                stride=1 if i == 0 else 2, act="hardswish",
                dw_groups_on="in", norm=spec, dtype=self.dtype,
                name=f"patch_embed{i}",
            )
            for i in range(4)
        ]
        stage = lambda i, name: MHSAStage(
            dim=dims[i], num_layers=self.num_layers[i],
            num_heads=self.num_heads[i], mlp_ratio=self.mlp_ratios[i],
            qkv_bias=self.qkv_bias, drop=self.drop_rate,
            drop_path=self.drop_path_rate, sup=sup, dsn=self.dsn,
            num_domains=self.num_domains, dtype=self.dtype, name=name,
        )
        self.mhsa_stages = [stage(i, f"mhsa_stage{i}") for i in range(4)]

        self.bridge_conv1 = conv2d(dims[3], 3, 1, 1, dtype=self.dtype,
                                   name="bridge_conv1")
        self.bridge_bn1 = make_bn(dims[3], spec, self.dtype,
                                  name="bridge_bn1")
        self.bridge_conv2 = conv2d(dims[3] * 2, 3, 1, 1, dtype=self.dtype,
                                   name="bridge_conv2")
        self.bridge_bn2 = make_bn(dims[3] * 2, spec, self.dtype,
                                  name="bridge_bn2")

        self.decoders = [
            UnetDecodingBlockTransformer(
                out_channels=dims[3 - i],
                mhsa=stage(3 - i, f"decoder{i + 1}_mhsa"),
                norm=spec, dtype=self.dtype, name=f"decoder{i + 1}",
            )
            for i in range(4)
        ]

        # optional universal adapters (BASE_DASE/BASE_USE comparators,
        # base_sota_adapt.py:346-351,524-528)
        if self.adapter == "DASE":
            from mdvit_tpu.models.adapters import DomainAttention

            self.encoder_adapters = [
                DomainAttention(dims[i], reduction=16, dtype=self.dtype,
                                name=f"enc_adapter{i}") for i in range(4)
            ]
            self.decoder_adapters = [
                DomainAttention(dims[3 - i], reduction=16, dtype=self.dtype,
                                name=f"dec_adapter{i}") for i in range(4)
            ]
            self.bridge_adapter = None
        elif self.adapter == "USE":
            from mdvit_tpu.models.adapters import SEBlock

            self.encoder_adapters = [
                SEBlock(dims[i], reduction=8, dtype=self.dtype,
                        name=f"enc_adapter{i}") for i in range(4)
            ]
            self.decoder_adapters = [
                SEBlock(dims[3 - i], reduction=8, dtype=self.dtype,
                        name=f"dec_adapter{i}") for i in range(4)
            ]
            self.bridge_adapter = SEBlock(dims[3] * 2, reduction=8,
                                          dtype=self.dtype,
                                          name="bridge_adapter")
        else:
            self.encoder_adapters = None
            self.decoder_adapters = None
            self.bridge_adapter = None

    def __call__(
        self,
        x: jax.Array,
        domain_onehot: jax.Array | None = None,
        train: bool = False,
        out_seg: bool = True,
    ):
        """Returns (encoder_outs, bridge_out, decoder_feat) — decoder_feat is
        the H/4 feature before upsampling; bridge/decoder are None when
        ``out_seg=False`` (feature-extraction mode, ``base.py:448-450``)."""
        x = self.stem1(x, domain_onehot, train)
        x = self.stem2(x, domain_onehot, train)

        encoder_outs = []
        for i in range(4):
            x = self.patch_embeds[i](x, domain_onehot, train)
            size = (x.shape[1], x.shape[2])
            t = grid_to_tokens(x)
            t = self.mhsa_stages[i](t, size, domain_onehot, train)
            x = tokens_to_grid(t, size)
            if self.adapter == "DASE":
                # DASE replaces the stream (base_sota_adapt.py:421-423)
                x = self.encoder_adapters[i](x)
                encoder_outs.append(x)
            elif self.adapter == "USE":
                # USE adapts only the skip copy (base_sota_adapt.py:598-599)
                encoder_outs.append(self.encoder_adapters[i](x))
            else:
                encoder_outs.append(x)

        if not out_seg:
            return encoder_outs, None, None

        out = self.bridge_conv1(encoder_outs[3])
        out = self.bridge_bn1(out, domain_onehot, use_running_average=not train)
        out = jax.nn.relu(out)
        out = self.bridge_conv2(out)
        out = self.bridge_bn2(out, domain_onehot, use_running_average=not train)
        out = jax.nn.relu(out)
        if self.bridge_adapter is not None:
            out = self.bridge_adapter(out)
        bridge_out = out

        for i in range(4):
            out = self.decoders[i](out, encoder_outs[3 - i], domain_onehot,
                                   train)
            if self.decoder_adapters is not None:
                out = self.decoder_adapters[i](out)
        return encoder_outs, bridge_out, out


class BASE(nn.Module):
    """BASE / BASE+Sup / BASE_DSN (``base.py:340-729``): encoder-decoder plus
    a 1×1 logit head. Returns a dict with ``seg`` logits ``(B,H,W,1)`` and the
    pooled stage-4 ``feat`` ``(B, 512)``."""

    img_size: int = 256
    in_chans: int = 3
    num_layers: Sequence[int] = (2, 2, 2, 2)
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    mlp_ratios: Sequence[float] = (8, 8, 4, 4)
    num_heads: Sequence[int] = (8, 8, 8, 8)
    qkv_bias: bool = True
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    adapt: str | None = None
    dsn: bool = False
    num_domains: int = 4
    bn_domain_stats: bool = True
    adapter: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        domain_onehot: jax.Array | None = None,
        train: bool = False,
        out_seg: bool = True,
    ):
        core = FATEncoderDecoder(
            img_size=self.img_size, in_chans=self.in_chans,
            num_layers=self.num_layers, embed_dims=self.embed_dims,
            mlp_ratios=self.mlp_ratios, num_heads=self.num_heads,
            qkv_bias=self.qkv_bias, drop_rate=self.drop_rate,
            drop_path_rate=self.drop_path_rate, adapt=self.adapt,
            dsn=self.dsn, num_domains=self.num_domains,
            bn_domain_stats=self.bn_domain_stats, adapter=self.adapter,
            dtype=self.dtype,
            name="core",
        )
        encoder_outs, _, dec = core(x, domain_onehot, train, out_seg)
        feat = jnp.mean(encoder_outs[3], axis=(1, 2))
        if not out_seg:
            return {"seg": None, "feat": feat}
        from mdvit_tpu.ops.resize import resize_bilinear

        img_size = (x.shape[1], x.shape[2])
        # 1×1 finalconv commutes with the bilinear upsample (reference
        # upsamples first, base.py:505-507) — conv at H/4 then resize 1 channel
        logits = conv2d(1, 1, 1, 0, dtype=self.dtype, name="finalconv")(dec)
        logits = resize_bilinear(logits, img_size)
        return {"seg": logits, "feat": feat}


@register_model("BASE")
def build_base(img_size=256, num_domains=4, adapt_method=None,
               dtype=jnp.float32, **kw):
    """Trainer construction parity: BASE uses drop 0.1/droppath 0.1 under the
    reference CLI (``multi_train_BASE.py:66-72``)."""
    return BASE(img_size=img_size, drop_rate=0.1, drop_path_rate=0.1,
                adapt="Sup" if adapt_method and "Sup" in str(adapt_method)
                else None,
                num_domains=num_domains, dtype=dtype, **kw)


@register_model("BASE_DSN")
def build_base_dsn(img_size=256, num_domains=4, adapt_method=None,
                   dtype=jnp.float32, **kw):
    return BASE(img_size=img_size, drop_rate=0.1, drop_path_rate=0.1,
                adapt="Sup" if adapt_method and "Sup" in str(adapt_method)
                else None,
                dsn=True, num_domains=num_domains, dtype=dtype, **kw)


@register_model("BASE_DASE")
def build_base_dase(img_size=256, num_domains=4, adapt_method=None,
                    dtype=jnp.float32, **kw):
    """DASE comparator (``multi_train_BASE.py:77-79``): plain BASE stages +
    input-conditioned DomainAttention adapters; no Sup, no DSN."""
    return BASE(img_size=img_size, drop_rate=0.1, drop_path_rate=0.1,
                adapt=None, num_domains=num_domains, adapter="DASE",
                dtype=dtype, **kw)


@register_model("BASE_USE")
def build_base_use(img_size=256, num_domains=4, adapt_method=None,
                   dtype=jnp.float32, **kw):
    return BASE(img_size=img_size, drop_rate=0.1, drop_path_rate=0.1,
                adapt=None, num_domains=num_domains, adapter="USE",
                dtype=dtype, **kw)
