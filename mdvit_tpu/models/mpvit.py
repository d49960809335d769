"""MPViT multi-path classification backbone (C31).

Reference: ``Models/Transformer/mpvit.py:603-810`` — the vendored MPViT
classifier whose L2 primitives MDViT reuses. Stages: sequential depthwise
patch embeds whose intermediate outputs form ``num_path`` parallel token
paths, each run through a shared-CPE/CRPE MHCA encoder, plus a convolutional
ResBlock path, concatenated and aggregated into the next stage's width.
Factories mirror ``mpvit_tiny/xsmall/small/base`` (``:710-810``).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mdvit_tpu.models.blocks import MHSAStage
from mdvit_tpu.models.registry import register_model
from mdvit_tpu.ops.layers import ConvBN, DWConvBN, NormSpec, conv2d, dense


class ResBlock(nn.Module):
    """Convolutional local-feature path (``mpvit.py:468-515``)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        feat = ConvBN(self.features, 1, 1, 0, act="hardswish",
                      dtype=self.dtype, name="conv1")(x, None, train)
        feat = conv2d(self.features, 3, 1, 1, groups=self.features,
                      use_bias=False, dtype=self.dtype, name="dwconv")(feat)
        from mdvit_tpu.ops.layers import make_bn

        feat = make_bn(self.features, NormSpec(), self.dtype, name="norm")(
            feat, None, use_running_average=not train)
        feat = jax.nn.hard_swish(feat)
        feat = ConvBN(self.features, 1, 1, 0, act=None, dtype=self.dtype,
                      name="conv2")(feat, None, train)
        return identity + feat


class MPViT(nn.Module):
    """Multi-path ViT classifier."""

    num_classes: int = 1000
    num_path: Sequence[int] = (2, 3, 3, 3)
    num_layers: Sequence[int] = (1, 2, 4, 1)
    embed_dims: Sequence[int] = (64, 96, 176, 216)
    mlp_ratios: Sequence[float] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (8, 8, 8, 8)
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, domain_onehot=None, train: bool = False):
        dims = list(self.embed_dims)
        x = ConvBN(dims[0] // 2, 3, 2, 1, act="hardswish", dtype=self.dtype,
                   name="stem1")(x, None, train)
        x = ConvBN(dims[0], 3, 2, 1, act="hardswish", dtype=self.dtype,
                   name="stem2")(x, None, train)

        # per-stage drop-path schedule (linear decay over all layers)
        dpr_all = np.linspace(0, self.drop_path_rate, sum(self.num_layers))
        cur = 0
        for i in range(4):
            # Patch_Embed_stage: sequential DWCPatchEmbeds; each intermediate
            # output is one attention path (mpvit.py:204-226); first embed
            # downsamples on stages 1-3
            paths = []
            for p in range(self.num_path[i]):
                x = DWConvBN(
                    features=dims[i], kernel_size=3,
                    stride=2 if (i > 0 and p == 0) else 1,
                    act="hardswish", dw_groups_on="in", norm=NormSpec(),
                    dtype=self.dtype, name=f"stage{i}_embed{p}",
                )(x, None, train)
                paths.append(x)

            # MHCA_stage: ResBlock on the first path's input + one encoder
            # per path, concat, aggregate (mpvit.py:525-566)
            outs = [ResBlock(dims[i], dtype=self.dtype,
                             name=f"stage{i}_invres")(paths[0], train)]
            dpr_stage = tuple(
                float(d) for d in dpr_all[cur:cur + self.num_layers[i]])
            cur += self.num_layers[i]
            for p, feat in enumerate(paths):
                size = (feat.shape[1], feat.shape[2])
                outs.append(MHSAStage(
                    dim=dims[i], num_layers=self.num_layers[i],
                    num_heads=self.num_heads[i],
                    mlp_ratio=self.mlp_ratios[i], drop=0.0,
                    drop_path_list=dpr_stage,
                    sup=False, dsn=False, dtype=self.dtype,
                    name=f"stage{i}_path{p}",
                )(feat, size, None, train))
            out_dim = dims[i + 1] if i + 1 < 4 else dims[i]
            x = ConvBN(out_dim, 1, 1, 0, act="hardswish", dtype=self.dtype,
                       name=f"stage{i}_aggregate")(
                jnp.concatenate(outs, axis=-1), None, train)

        feat = jnp.mean(x, axis=(1, 2))
        logits = dense(self.num_classes, dtype=self.dtype, name="cls")(feat)
        return {"logits": logits, "feat": feat}


def _factory(name, **cfg):
    @register_model(name)
    def build(img_size=224, num_domains=4, adapt_method=None,
              dtype=jnp.float32, num_classes=1000, **kw):
        kw.pop("decoder_name", None)
        return MPViT(num_classes=num_classes, dtype=dtype, **cfg, **kw)

    return build


_factory("mpvit_tiny", num_path=(2, 3, 3, 3), num_layers=(1, 2, 4, 1),
         embed_dims=(64, 96, 176, 216), mlp_ratios=(2, 2, 2, 2))
_factory("mpvit_xsmall", num_path=(2, 3, 3, 3), num_layers=(1, 2, 4, 1),
         embed_dims=(64, 128, 192, 256), mlp_ratios=(4, 4, 4, 4))
_factory("mpvit_small", num_path=(2, 3, 3, 3), num_layers=(1, 3, 6, 3),
         embed_dims=(64, 128, 216, 288), mlp_ratios=(4, 4, 4, 4))
_factory("mpvit_base", num_path=(2, 3, 3, 3), num_layers=(1, 3, 8, 3),
         embed_dims=(128, 224, 368, 480), mlp_ratios=(4, 4, 4, 4))
