"""TransFuse comparators (C23-C25): dual-branch CNN + ViT fusion.

Reference: ``Models/Hybrid_models/TransFuseFolder/`` — a torchvision
ResNet34/50 (layer4 removed) in parallel with a DeiT
(small: embed 384/depth 8/heads 6; base: 768/12/12), fused per scale by
``BiFusion_block`` (SE channel-attention on the transformer branch, spatial
attention on the CNN branch, bilinear pooling ``W(W_g·g ⊙ W_x·x)``,
``TransFuse.py:25-76``), attention-gated ``Up`` merges (``:523-577``) and
three output heads (``:95-118``). ``TransFuse_S_adapt`` threads the Sup
domain gate into every DeiT attention block
(``vision_transformer.py:125-169``).

Known reference defect NOT replicated: the token grid is hardcoded to 14×14
(224² only, ``TransFuse.py:129``) while training runs at 256²; here the grid
is ``img_size // 16``. Pretrained torch weights are not bundled (no network
egress); ``scripts/convert_torch_weights.py`` maps torchvision/timm state
dicts into this module's parameter tree when checkpoints are provided.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mdvit_tpu.models.registry import register_model
from mdvit_tpu.ops.layers import DropPath, Dropout2d, NormSpec, conv2d, dense, make_bn
from mdvit_tpu.ops.resize import resize_bilinear_align_corners


def _bn(c, dtype, name):
    return make_bn(c, NormSpec(), dtype, name=name)


def _pair(size) -> tuple[int, int]:
    """(H, W) from an int or a 2-sequence. TransFuse_L_384 is non-square:
    the reference interpolates the DeiT pos-embed to a (24, 32) token grid,
    i.e. a 384×512 input (``DeiT.py:178-181``, ``TransFuse.py:443``)."""
    if isinstance(size, int):
        return (size, size)
    h, w = size
    return (int(h), int(w))


# ----------------------------- ResNet branch ------------------------------


class ResNetBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = conv2d(self.planes, 3, self.stride, 1, use_bias=False,
                     dtype=self.dtype, name="conv1")(x)
        out = _bn(self.planes, self.dtype, "bn1")(out, None, not train)
        out = jax.nn.relu(out)
        out = conv2d(self.planes, 3, 1, 1, use_bias=False, dtype=self.dtype,
                     name="conv2")(out)
        out = _bn(self.planes, self.dtype, "bn2")(out, None, not train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = conv2d(self.planes, 1, self.stride, 0, use_bias=False,
                              dtype=self.dtype, name="down_conv")(x)
            identity = _bn(self.planes, self.dtype, "down_bn")(
                identity, None, not train)
        return jax.nn.relu(out + identity)


class ResNetBottleneck(nn.Module):
    planes: int  # bottleneck width; output is 4·planes
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.planes * 4
        identity = x
        out = conv2d(self.planes, 1, 1, 0, use_bias=False, dtype=self.dtype,
                     name="conv1")(x)
        out = _bn(self.planes, self.dtype, "bn1")(out, None, not train)
        out = jax.nn.relu(out)
        out = conv2d(self.planes, 3, self.stride, 1, use_bias=False,
                     dtype=self.dtype, name="conv2")(out)
        out = _bn(self.planes, self.dtype, "bn2")(out, None, not train)
        out = jax.nn.relu(out)
        out = conv2d(out_ch, 1, 1, 0, use_bias=False, dtype=self.dtype,
                     name="conv3")(out)
        out = _bn(out_ch, self.dtype, "bn3")(out, None, not train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = conv2d(out_ch, 1, self.stride, 0, use_bias=False,
                              dtype=self.dtype, name="down_conv")(x)
            identity = _bn(out_ch, self.dtype, "down_bn")(
                identity, None, not train)
        return jax.nn.relu(out + identity)


class ResNetStem3Stages(nn.Module):
    """torchvision resnet34/50 through layer3 (layer4 removed,
    ``TransFuse.py:85-87``). Returns (layer1, layer2, layer3) features."""

    arch: str = "resnet34"  # 'resnet34' | 'resnet50'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(64, 7, 2, 3, use_bias=False, dtype=self.dtype,
                   name="conv1")(x)
        x = _bn(64, self.dtype, "bn1")(x, None, not train)
        x = jax.nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                  (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
        if self.arch == "resnet34":
            blocks, cls = (3, 4, 6), ResNetBasicBlock
            widths = (64, 128, 256)
        else:
            blocks, cls = (3, 4, 6), ResNetBottleneck
            widths = (64, 128, 256)
        outs = []
        for li, (n, w) in enumerate(zip(blocks, widths)):
            for bi in range(n):
                stride = 2 if (li > 0 and bi == 0) else 1
                x = cls(w, stride, dtype=self.dtype,
                        name=f"layer{li + 1}_{bi}")(x, train)
            outs.append(x)
        return outs  # [C1@H/4, C2@H/8, C3@H/16]


# ------------------------------- DeiT branch ------------------------------


class ViTAttention(nn.Module):
    """Vanilla MHSA; ``sup=True`` adds the Sup domain gate before the output
    projection (``vision_transformer.py:125-169``)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    sup: bool = False
    num_domains: int = 4
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, domain_onehot=None, train: bool = False):
        b, n, c = x.shape
        h = self.num_heads
        ch = c // h
        qkv = dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, ch).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnk,bhmk->bhnm", q, k,
                          preferred_element_type=jnp.float32) * (ch ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmv->bhnv", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        if self.sup:
            hidden = max(self.dim // 2, 4)
            g = dense(hidden, dtype=self.dtype, name="domain_layer_fc1")(
                domain_onehot.astype(out.dtype))
            g = jax.nn.relu(g)
            g = dense(h * ch, dtype=self.dtype, name="domain_layer_fc2")(g)
            g = jax.nn.softmax(
                g.reshape(b, h, ch).astype(jnp.float32), axis=1
            ).astype(out.dtype)
            out = out * g[:, :, None, :]
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = dense(c, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.drop, deterministic=not train)(out)


class DeiT(nn.Module):
    """ViT encoder without cls token in use: patch conv, interpolated pos
    embed over the actual grid (``DeiT.py:104-111,129-137``), pre-LN blocks,
    final LN. Returns tokens (B, N, C)."""

    img_size: int | Sequence[int] = 256
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 8
    num_heads: int = 6
    mlp_ratio: float = 4.0
    sup: bool = False
    num_domains: int = 4
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, domain_onehot=None, train: bool = False):
        from mdvit_tpu.ops.layers import Mlp
        from mdvit_tpu.ops.norm import DomainLayerNorm

        ih, iw = _pair(self.img_size)
        gh, gw = ih // self.patch_size, iw // self.patch_size
        x = conv2d(self.embed_dim, self.patch_size, self.patch_size, 0,
                   dtype=self.dtype, name="patch_embed")(x)
        b = x.shape[0]
        x = x.reshape(b, gh * gw, self.embed_dim)
        pos = self.param(
            "pos_embed",
            lambda key, shape: 0.02 * jax.random.normal(key, shape),
            (1, gh * gw, self.embed_dim),
        )
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        for i in range(self.depth):
            cur = DomainLayerNorm(self.embed_dim, dtype=self.dtype,
                                  name=f"block{i}_norm1")(x)
            cur = ViTAttention(
                dim=self.embed_dim, num_heads=self.num_heads, sup=self.sup,
                num_domains=self.num_domains, drop=self.drop,
                dtype=self.dtype, name=f"block{i}_attn",
            )(cur, domain_onehot, train)
            x = x + cur
            cur = DomainLayerNorm(self.embed_dim, dtype=self.dtype,
                                  name=f"block{i}_norm2")(x)
            cur = Mlp(hidden_features=int(self.embed_dim * self.mlp_ratio),
                      drop=self.drop, dtype=self.dtype,
                      name=f"block{i}_mlp")(cur, train)
            x = x + cur
        return DomainLayerNorm(self.embed_dim, dtype=self.dtype,
                               name="norm")(x)


# --------------------------- fusion / decoder -----------------------------


class ConvBnRelu(nn.Module):
    """``Conv`` helper (``TransFuse.py:634-653``): conv (+BN) (+ReLU)."""

    out_dim: int
    kernel: int = 3
    bn: bool = False
    relu: bool = True
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(self.out_dim, self.kernel, 1, (self.kernel - 1) // 2,
                   use_bias=self.use_bias, dtype=self.dtype, name="conv")(x)
        if self.bn:
            x = _bn(self.out_dim, self.dtype, "bn")(x, None, not train)
        if self.relu:
            x = jax.nn.relu(x)
        return x


class Residual(nn.Module):
    """Pre-act bottleneck residual (``TransFuse.py:600-631``)."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        half = self.out_dim // 2
        residual = x
        if inp != self.out_dim:
            residual = ConvBnRelu(self.out_dim, 1, relu=False,
                                  dtype=self.dtype, name="skip_layer")(x, train)
        out = _bn(inp, self.dtype, "bn1")(x, None, not train)
        out = jax.nn.relu(out)
        out = ConvBnRelu(half, 1, relu=False, dtype=self.dtype,
                         name="conv1")(out, train)
        out = _bn(half, self.dtype, "bn2")(out, None, not train)
        out = jax.nn.relu(out)
        out = ConvBnRelu(half, 3, relu=False, dtype=self.dtype,
                         name="conv2")(out, train)
        out = _bn(half, self.dtype, "bn3")(out, None, not train)
        out = jax.nn.relu(out)
        out = ConvBnRelu(self.out_dim, 1, relu=False, dtype=self.dtype,
                         name="conv3")(out, train)
        return out + residual


class BiFusion(nn.Module):
    """Bilinear pooling + dual attention fusion (``TransFuse.py:25-76``).
    g = CNN branch, x = transformer branch."""

    ch_2: int
    r_2: int
    ch_int: int
    ch_out: int
    drop_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, g, x, train: bool = False):
        w_g = ConvBnRelu(self.ch_int, 1, bn=True, relu=False,
                         dtype=self.dtype, name="W_g")(g, train)
        w_x = ConvBnRelu(self.ch_int, 1, bn=True, relu=False,
                         dtype=self.dtype, name="W_x")(x, train)
        bp = ConvBnRelu(self.ch_int, 3, bn=True, relu=True,
                        dtype=self.dtype, name="W")(w_g * w_x, train)

        # spatial attention on CNN branch
        pooled = jnp.concatenate(
            [jnp.max(g, axis=-1, keepdims=True),
             jnp.mean(g, axis=-1, keepdims=True)], axis=-1)
        sp = ConvBnRelu(1, 7, bn=True, relu=False, use_bias=False,
                        dtype=self.dtype, name="spatial")(pooled, train)
        g = jax.nn.sigmoid(sp) * g

        # channel attention on transformer branch
        ca = jnp.mean(x, axis=(1, 2), keepdims=True)
        ca = conv2d(self.ch_2 // self.r_2, 1, 1, 0, dtype=self.dtype,
                    name="fc1")(ca)
        ca = jax.nn.relu(ca)
        ca = conv2d(self.ch_2, 1, 1, 0, dtype=self.dtype, name="fc2")(ca)
        x = jax.nn.sigmoid(ca) * x

        fuse = Residual(self.ch_out, dtype=self.dtype, name="residual")(
            jnp.concatenate([g, x, bp], axis=-1), train)
        return Dropout2d(self.drop_rate, name="dropout")(fuse, train)


class AttentionGate(nn.Module):
    """Additive attention gate (``TransFuse.py:556-577``)."""

    f_int: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, g, x, train: bool = False):
        g1 = ConvBnRelu(self.f_int, 1, bn=True, relu=False,
                        dtype=self.dtype, name="W_g")(g, train)
        x1 = ConvBnRelu(self.f_int, 1, bn=True, relu=False,
                        dtype=self.dtype, name="W_x")(x, train)
        psi = jax.nn.relu(g1 + x1)
        psi = ConvBnRelu(1, 1, bn=True, relu=False, dtype=self.dtype,
                         name="psi")(psi, train)
        return x * jax.nn.sigmoid(psi)


class UpBlock(nn.Module):
    """×2 bilinear (align_corners=True) upsample, optional gated skip concat,
    DoubleConv (``TransFuse.py:523-553,580-597``)."""

    out_ch: int
    attn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2=None, train: bool = False):
        x1 = resize_bilinear_align_corners(
            x1, (x1.shape[1] * 2, x1.shape[2] * 2))
        if x2 is not None:
            if self.attn:
                x2 = AttentionGate(self.out_ch, dtype=self.dtype,
                                   name="attn_block")(x1, x2, train)
            x1 = jnp.concatenate([x2, x1], axis=-1)
        # DoubleConv with identity 1x1 branch
        dc = conv2d(self.out_ch, 3, 1, 1, dtype=self.dtype, name="dc_conv1")(x1)
        dc = _bn(self.out_ch, self.dtype, "dc_bn1")(dc, None, not train)
        dc = jax.nn.relu(dc)
        dc = conv2d(self.out_ch, 3, 1, 1, dtype=self.dtype, name="dc_conv2")(dc)
        dc = _bn(self.out_ch, self.dtype, "dc_bn2")(dc, None, not train)
        idn = conv2d(self.out_ch, 1, 1, 0, dtype=self.dtype, name="id_conv")(x1)
        idn = _bn(self.out_ch, self.dtype, "id_bn")(idn, None, not train)
        return jax.nn.relu(dc + idn)


class TransFuse(nn.Module):
    """TransFuse_S/_L (+_adapt). Returns the three deep-supervision maps
    ``(map_x, map_1, map_2)`` as NHWC logits; eval uses map_2
    (``multi_train_TransFuse.py:164-172,240-243``)."""

    img_size: int | Sequence[int] = 256
    num_classes: int = 1
    variant: str = "S"  # 'S' | 'L'
    sup: bool = False  # DeiT Sup gate (TransFuse_S_adapt)
    num_domains: int = 4
    drop_rate: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, domain_onehot=None, train: bool = False,
                 out_seg: bool = True):
        if self.variant == "S":
            arch, ed, depth, heads = "resnet34", 384, 8, 6
            c1, c2, c3 = 64, 128, 256  # resnet layer dims
            u1, u2 = 128, 64
            head_mid = 64
        else:
            arch, ed, depth, heads = "resnet50", 768, 12, 12
            c1, c2, c3 = 256, 512, 1024
            u1, u2 = 512, 256
            head_mid = 256

        ih, iw = _pair(self.img_size)
        gh, gw = ih // 16, iw // 16
        tokens = DeiT(
            img_size=(ih, iw), embed_dim=ed, depth=depth,
            num_heads=heads, sup=self.sup, num_domains=self.num_domains,
            dtype=self.dtype, name="transformer",
        )(x, domain_onehot, train)
        x_b = tokens.reshape(x.shape[0], gh, gw, ed)
        drop = lambda t, name: Dropout2d(self.drop_rate, name=name)(t, train)
        x_b = drop(x_b, "drop_b")
        x_b_1 = drop(UpBlock(u1, dtype=self.dtype, name="up1")(x_b, None, train),
                     "drop_b1")
        x_b_2 = drop(UpBlock(u2, dtype=self.dtype, name="up2")(x_b_1, None, train),
                     "drop_b2")

        feats = ResNetStem3Stages(arch=arch, dtype=self.dtype,
                                  name="resnet")(x, train)
        x_u_2 = drop(feats[0], "drop_u2")
        x_u_1 = drop(feats[1], "drop_u1")
        x_u = drop(feats[2], "drop_u")

        x_c = BiFusion(ch_2=ed, r_2=4, ch_int=c3, ch_out=c3,
                       drop_rate=self.drop_rate / 2, dtype=self.dtype,
                       name="up_c")(x_u, x_b, train)
        x_c_1_1 = BiFusion(ch_2=u1, r_2=2, ch_int=c2, ch_out=c2,
                           drop_rate=self.drop_rate / 2, dtype=self.dtype,
                           name="up_c_1_1")(x_u_1, x_b_1, train)
        x_c_1 = UpBlock(u1, attn=True, dtype=self.dtype,
                        name="up_c_1_2")(x_c, x_c_1_1, train)
        x_c_2_1 = BiFusion(ch_2=u2, r_2=1, ch_int=c1, ch_out=c1,
                           drop_rate=self.drop_rate / 2, dtype=self.dtype,
                           name="up_c_2_1")(x_u_2, x_b_2, train)
        x_c_2 = UpBlock(u2, attn=True, dtype=self.dtype,
                        name="up_c_2_2")(x_c_1, x_c_2_1, train)

        def head(t, first_1x1: int | None, name):
            if first_1x1 is not None:
                t = ConvBnRelu(head_mid, 1, bn=True, relu=True,
                               dtype=self.dtype, name=f"{name}_0")(t, train)
            t = ConvBnRelu(head_mid, 3, bn=True, relu=True,
                           dtype=self.dtype, name=f"{name}_1")(t, train)
            return ConvBnRelu(self.num_classes, 3, bn=False, relu=False,
                              dtype=self.dtype, name=f"{name}_2")(t, train)

        full = (ih, iw)
        map_x = resize_bilinear_align_corners(head(x_c, c3, "final_x"), full)
        map_1 = resize_bilinear_align_corners(head(x_b_2, None, "final_1"), full)
        map_2 = resize_bilinear_align_corners(head(x_c_2, None, "final_2"), full)
        return {"seg": (map_x, map_1, map_2),
                "feat": jnp.mean(x_c, axis=(1, 2))}


@register_model("TransFuse_S")
def build_transfuse_s(img_size=256, num_domains=4, adapt_method=None,
                      dtype=jnp.float32, **kw):
    kw.pop("decoder_name", None)
    return TransFuse(img_size=img_size, variant="S", sup=False,
                     num_domains=num_domains, dtype=dtype, **kw)


@register_model("TransFuse_S_adapt")
def build_transfuse_s_adapt(img_size=256, num_domains=4, adapt_method="Sup",
                            dtype=jnp.float32, **kw):
    kw.pop("decoder_name", None)
    return TransFuse(img_size=img_size, variant="S", sup=True,
                     num_domains=num_domains, dtype=dtype, **kw)


@register_model("TransFuse_L")
def build_transfuse_l(img_size=256, num_domains=4, adapt_method=None,
                      dtype=jnp.float32, **kw):
    kw.pop("decoder_name", None)
    return TransFuse(img_size=img_size, variant="L", sup=False,
                     num_domains=num_domains, dtype=dtype, **kw)


@register_model("TransFuse_L_384")
def build_transfuse_l_384(img_size=None, num_domains=4, adapt_method=None,
                          dtype=jnp.float32, **kw):
    """The 384 L variant (``TransFuse.py:394-496``) is defined for a FIXED
    non-square 384×512 input — its DeiT-base pos-embed is interpolated to a
    (24, 32) token grid (``DeiT.py:168-181``). ``img_size`` from the config is
    ignored, matching the reference's hardcoded geometry. Like the reference
    (whose square-only trainers never dispatch this class), it is
    constructible/testable through the model API but not trainable from the
    square-``data.img_size`` CLI pipeline."""
    kw.pop("decoder_name", None)
    return TransFuse(img_size=(384, 512), variant="L", sup=False,
                     num_domains=num_domains, dtype=dtype, **kw)
