"""MDViT: BASE + domain-adapter gates ("Sup") + MKD auxiliary debranches.

Reference: ``Models/Transformer/mdvit.py:474-730`` (MDViT) and ``:735-960``
(MDViT_DSN). The reference keeps four separate debranch modules and selects
one with Python ``if d == '0': ...`` (``mdvit.py:714-724``); here the four
debranches are ONE ``nn.vmap``-stacked module whose leading parameter axis is
the domain, and dispatch is data:

* ``aux_mode='grouped'`` (training): the batch is laid out as D equal
  domain-contiguous groups; features reshape to ``(D, B/D, ...)`` and map
   1:1 onto the stacked debranch — each domain's samples hit exactly its own
  debranch (and only its BN stats update), with zero redundant compute.
* ``aux_mode='select'`` (eval, arbitrary batches): features broadcast to all
  D debranches and the per-sample one-hot picks each sample's output.
* ``aux_mode='none'``: skip the aux branch (inference on the primary head).

Decoder choices mirror ``decoder_name ∈ {MLPFM, MLP, DeepLabV3, Transformer}``
(``mdvit.py:595-642``).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mdvit_tpu.models.base import FATEncoderDecoder
from mdvit_tpu.models.blocks import MHSAStage
from mdvit_tpu.models.decoders import (
    DeepLabV3Decoder,
    MLPDecoder,
    MLPDecoderFM,
    UnetDecodingBlockTransformer,
)
from mdvit_tpu.models.registry import register_model
from mdvit_tpu.ops.layers import NormSpec, conv2d
from mdvit_tpu.ops.resize import resize_bilinear


class TransformerDebranch(nn.Module):
    """The MDViT^T per-domain debranch: a full transformer decoding chain
    (``mdvit.py:614-642``), built with plain (non-Sup, non-DSN) stages."""

    VMAP_GROUP_CONV = True  # CPE/CRPE/patch-embed depthwise convs

    img_size: int
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    num_layers: Sequence[int] = (2, 2, 2, 2)
    mlp_ratios: Sequence[float] = (8, 8, 4, 4)
    num_heads: Sequence[int] = (8, 8, 8, 8)
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, domain_onehot=None, train: bool = False):
        bridge_out, encoder_outs = features[-1], features[:4]
        dims = self.embed_dims
        spec = NormSpec()  # plain shared norms inside a per-domain branch
        out = bridge_out
        for i in range(4):
            stage = MHSAStage(
                dim=dims[3 - i], num_layers=self.num_layers[3 - i],
                num_heads=self.num_heads[3 - i],
                mlp_ratio=self.mlp_ratios[3 - i], drop=self.drop_rate,
                drop_path=self.drop_path_rate, sup=False, dsn=False,
                dtype=self.dtype, name=f"decoder{i + 1}_mhsa",
            )
            out = UnetDecodingBlockTransformer(
                out_channels=dims[3 - i], mhsa=stage, norm=spec,
                dtype=self.dtype, name=f"decoder{i + 1}",
            )(out, encoder_outs[3 - i], None, train)
        out = conv2d(1, 1, 1, 0, dtype=self.dtype, name="finalconv")(out)
        return resize_bilinear(out, (self.img_size, self.img_size))


class MDViT(nn.Module):
    """Flagship model. ``__call__`` returns
    ``{'seg': (logits, aux_logits), 'feat': pooled}`` matching the reference
    forward contract (``mdvit.py:667-730``)."""

    img_size: int = 256
    in_chans: int = 3
    num_layers: Sequence[int] = (2, 2, 2, 2)
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    mlp_ratios: Sequence[float] = (8, 8, 4, 4)
    num_heads: Sequence[int] = (8, 8, 8, 8)
    qkv_bias: bool = True
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    adapt: str | None = "Sup"
    dsn: bool = False
    num_domains: int = 4
    decoder_name: str = "MLPFM"  # MLPFM | MLP | DeepLabV3 | Transformer
    bn_domain_stats: bool = True
    dtype: jnp.dtype = jnp.float32

    def debranch_module(self):
        """Unstacked debranch module for SINGLE-domain application: the
        reference's eval dispatches each batch to exactly one debranch by the
        batch's domain id (``mdvit.py:714-724``, val loop ``:263-268``), so
        the eval step applies this module with the vmap-stacked variables
        sliced at the batch's domain index — ¼ the 'select' broadcast work.
        """
        cls, kwargs = self._debranch_cls()
        return cls(**kwargs, parent=None)  # detached standalone module

    def _debranch_cls(self):
        size = (self.img_size, self.img_size)
        spec = NormSpec()  # each stacked slice is already domain-private
        if self.decoder_name == "MLPFM":
            return MLPDecoderFM, dict(hidden_channel=512, out_channel=1,
                                      img_size=size, norm=spec,
                                      dtype=self.dtype)
        if self.decoder_name == "MLP":
            return MLPDecoder, dict(hidden_channel=512, out_channel=1,
                                    img_size=size, norm=spec,
                                    dtype=self.dtype)
        if self.decoder_name == "DeepLabV3":
            return DeepLabV3Decoder, dict(out_channel=1, img_size=size,
                                          norm=spec, dtype=self.dtype)
        if self.decoder_name == "Transformer":
            return TransformerDebranch, dict(
                img_size=self.img_size, embed_dims=self.embed_dims,
                num_layers=self.num_layers, mlp_ratios=self.mlp_ratios,
                num_heads=self.num_heads, drop_rate=self.drop_rate,
                drop_path_rate=self.drop_path_rate, dtype=self.dtype)
        raise ValueError(f"unknown decoder_name {self.decoder_name!r}")

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        domain_onehot: jax.Array | None = None,
        train: bool = False,
        out_feat: bool = False,
        out_seg: bool = True,
        aux_mode: str = "grouped",
        aux_sharding=None,
    ) -> dict[str, Any]:
        core = FATEncoderDecoder(
            img_size=self.img_size, in_chans=self.in_chans,
            num_layers=self.num_layers, embed_dims=self.embed_dims,
            mlp_ratios=self.mlp_ratios, num_heads=self.num_heads,
            qkv_bias=self.qkv_bias, drop_rate=self.drop_rate,
            drop_path_rate=self.drop_path_rate, adapt=self.adapt,
            dsn=self.dsn, num_domains=self.num_domains,
            bn_domain_stats=self.bn_domain_stats, dtype=self.dtype,
            name="core",
        )
        encoder_outs, bridge_out, dec = core(x, domain_onehot, train, out_seg)
        feat = jnp.mean(encoder_outs[3], axis=(1, 2))
        if not out_seg:
            return {"seg": None, "feat": feat}

        img_size = (x.shape[1], x.shape[2])
        # 1×1 finalconv commutes with the upsample — conv at H/4, resize 1ch
        logits = conv2d(1, 1, 1, 0, dtype=self.dtype, name="finalconv")(dec)
        logits = resize_bilinear(logits, img_size)

        # ------- MKD auxiliary debranch (stacked over domains) -------
        if self.decoder_name == "Transformer":
            features = list(encoder_outs) + [bridge_out]
        elif self.decoder_name == "MLPFM":
            features = list(encoder_outs) + [dec]
        else:
            features = list(encoder_outs)

        cls, kwargs = self._debranch_cls()
        Stacked = nn.vmap(
            cls,
            in_axes=(0, None, None),
            out_axes=0,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True, "dropout": True},
        )
        debranch = Stacked(**kwargs, name="debranch")

        aux = None
        d = self.num_domains
        if aux_mode == "grouped":
            b = x.shape[0]
            assert b % d == 0, (
                f"grouped aux_mode needs batch ({b}) divisible by "
                f"num_domains ({d}), domain-contiguous"
            )
            grouped = jax.tree_util.tree_map(
                lambda f: f.reshape((d, b // d) + f.shape[1:]), features
            )
            constrain = (
                aux_sharding is not None
                and getattr(cls, "VMAP_GROUP_CONV", True)
            )
            if constrain:
                # The conv-containing debranches lower under nn.vmap to
                # grouped convolutions whose feature-group dimension GSPMD
                # cannot split; pin the grouped layout to shard the PER-DOMAIN
                # batch axis (axis 1) and replicate the domain axis so the
                # per-shard convs stay valid. The MLP/MLPFM debranches are
                # pure matmuls (PointwiseConv) — no constraint needed: the
                # (D·B)→(D, B/D) reshape propagates the batch sharding onto a
                # (D-ways, B/D-ways) tiling GSPMD partitions with zero
                # resharding collectives.
                grouped = jax.tree_util.tree_map(
                    lambda f: jax.lax.with_sharding_constraint(
                        f, aux_sharding), grouped
                )
            aux = debranch(grouped, None, train)  # (D, B/D, H, W, 1)
            if constrain:
                aux = jax.lax.with_sharding_constraint(aux, aux_sharding)
            aux = aux.reshape((b,) + aux.shape[2:])
        elif aux_mode == "select":
            tiled = jax.tree_util.tree_map(
                lambda f: jnp.broadcast_to(f[None], (d,) + f.shape), features
            )
            outs = debranch(tiled, None, False)  # (D, B, H, W, 1)
            oh = domain_onehot.astype(outs.dtype)
            aux = jnp.einsum("dbhwc,bd->bhwc", outs, oh)
        elif aux_mode == "features":
            # skip the stacked debranch; the caller applies debranch_module()
            # with domain-sliced variables (single-domain eval batches)
            return {"seg": (logits, None), "feat": feat if out_feat else None,
                    "aux_features": features}
        elif aux_mode != "none":
            raise ValueError(f"unknown aux_mode {aux_mode!r}")

        return {"seg": (logits, aux), "feat": feat if out_feat else None}


@register_model("MDViT")
def build_mdvit(img_size=256, num_domains=4, adapt_method="Sup",
                decoder_name="MLPFM", dtype=jnp.float32, **kw):
    """Reference trainer construction: ``MDViT(img_size, drop_rate=0.1,
    drop_path_rate=0.1, adapt_method, num_domains=K, decoder_name='MLPFM')``
    (``multi_train_MDViT.py:57-60``)."""
    return MDViT(img_size=img_size, drop_rate=0.1, drop_path_rate=0.1,
                 adapt="Sup" if adapt_method and "Sup" in str(adapt_method)
                 else None,
                 num_domains=num_domains, decoder_name=decoder_name,
                 dtype=dtype, **kw)


@register_model("MDViT_DSN")
def build_mdvit_dsn(img_size=256, num_domains=4, adapt_method="Sup",
                    decoder_name="MLPFM", dtype=jnp.float32, **kw):
    return MDViT(img_size=img_size, drop_rate=0.1, drop_path_rate=0.1,
                 adapt="Sup" if adapt_method and "Sup" in str(adapt_method)
                 else None,
                 dsn=True, num_domains=num_domains, decoder_name=decoder_name,
                 dtype=dtype, **kw)
