"""SwinUNETR comparator (C20).

The reference does not vendor this model — it imports
``monai.networks.nets.SwinUNETR(img_size=(256,256), in_channels=3,
out_channels=1, feature_size=48, spatial_dims=2)``
(``multi_train_BASE.py:73-75``). This is a capability-equivalent 2-D
implementation of that architecture: a Swin encoder (patch 2, dims
48·2^i, depths (2,2,2,2), heads (3,6,12,24)) feeding UNETR-style
residual conv blocks (InstanceNorm + LeakyReLU) with transposed-conv
upsampling. Window size is 8 (monai pads its window-7 partitions; 8 divides
every stage resolution at 256², so no padding path is needed).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mdvit_tpu.models.registry import register_model
from mdvit_tpu.models.swin_unet import PatchMerging, SwinBlock
from mdvit_tpu.ops.layers import conv2d
from mdvit_tpu.ops.norm import DomainLayerNorm


class InstanceNorm(nn.Module):
    num_features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, (self.num_features,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_features,))
        return (y * scale + bias).astype(x.dtype)


class UnetrBasicBlock(nn.Module):
    """Residual block: (conv3 → IN → lrelu) ×2 + 1×1 skip."""

    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        lrelu = lambda t: jax.nn.leaky_relu(t, 0.01)
        out = conv2d(self.out_ch, 3, 1, 1, use_bias=False, dtype=self.dtype,
                     name="conv1")(x)
        out = InstanceNorm(self.out_ch, dtype=self.dtype, name="norm1")(out)
        out = lrelu(out)
        out = conv2d(self.out_ch, 3, 1, 1, use_bias=False, dtype=self.dtype,
                     name="conv2")(out)
        out = InstanceNorm(self.out_ch, dtype=self.dtype, name="norm2")(out)
        if x.shape[-1] != self.out_ch:
            x = conv2d(self.out_ch, 1, 1, 0, use_bias=False, dtype=self.dtype,
                       name="conv3")(x)
            x = InstanceNorm(self.out_ch, dtype=self.dtype, name="norm3")(x)
        return lrelu(out + x)


class UnetrUpBlock(nn.Module):
    """Transposed-conv ×2 upsample → concat skip → UnetrBasicBlock."""

    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        x = nn.ConvTranspose(
            features=self.out_ch, kernel_size=(2, 2), strides=(2, 2),
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="transp_conv",
        )(x)
        x = jnp.concatenate([x, skip], axis=-1)
        return UnetrBasicBlock(self.out_ch, dtype=self.dtype,
                               name="conv_block")(x)


class SwinUNETR(nn.Module):
    """2-D SwinUNETR: Swin encoder (patch 2) + UNETR conv decoder."""

    img_size: int = 256
    in_channels: int = 3
    out_channels: int = 1
    feature_size: int = 48
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 8
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, domain_onehot=None, train: bool = False,
                 out_seg: bool = True):
        fs = self.feature_size
        x_in = x
        res0 = self.img_size // 2
        # patch embed (2×2 stride-2 conv)
        h = conv2d(fs, 2, 2, 0, dtype=self.dtype, name="patch_embed")(x)
        b = h.shape[0]
        hidden = []
        t = h.reshape(b, res0 * res0, fs)
        dims = [fs * 2 ** i for i in range(4)]
        for i in range(4):
            res = res0 // (2 ** i)
            hidden.append(t.reshape(b, res, res, dims[i]))
            for j in range(self.depths[i]):
                t = SwinBlock(
                    dim=dims[i], input_resolution=(res, res),
                    num_heads=self.num_heads[i], window=self.window,
                    shift=0 if j % 2 == 0 else self.window // 2,
                    dtype=self.dtype, name=f"swin{i}_block{j}",
                )(t, train)
            t = PatchMerging((res, res), dims[i], dtype=self.dtype,
                             name=f"merge{i}")(t, train)
        res4 = res0 // 16
        x4 = t.reshape(b, res4, res4, fs * 16)
        hidden.append(x4)
        feat = jnp.mean(x4, axis=(1, 2))
        if not out_seg:
            return {"seg": None, "feat": feat}

        enc0 = UnetrBasicBlock(fs, dtype=self.dtype, name="encoder1")(x_in)
        enc1 = UnetrBasicBlock(fs, dtype=self.dtype, name="encoder2")(hidden[0])
        enc2 = UnetrBasicBlock(2 * fs, dtype=self.dtype,
                               name="encoder3")(hidden[1])
        enc3 = UnetrBasicBlock(4 * fs, dtype=self.dtype,
                               name="encoder4")(hidden[2])
        dec4 = UnetrBasicBlock(16 * fs, dtype=self.dtype,
                               name="encoder10")(hidden[4])
        dec3 = UnetrUpBlock(8 * fs, dtype=self.dtype,
                            name="decoder5")(dec4, hidden[3])
        dec2 = UnetrUpBlock(4 * fs, dtype=self.dtype,
                            name="decoder4")(dec3, enc3)
        dec1 = UnetrUpBlock(2 * fs, dtype=self.dtype,
                            name="decoder3")(dec2, enc2)
        dec0 = UnetrUpBlock(fs, dtype=self.dtype,
                            name="decoder2")(dec1, enc1)
        out = UnetrUpBlock(fs, dtype=self.dtype,
                           name="decoder1")(dec0, enc0)
        logits = conv2d(self.out_channels, 1, 1, 0, dtype=self.dtype,
                        name="out")(out)
        return {"seg": logits, "feat": feat}


@register_model("SwinUNETR")
def build_swin_unetr(img_size=256, num_domains=4, adapt_method=None,
                     dtype=jnp.float32, **kw):
    kw.pop("decoder_name", None)
    return SwinUNETR(img_size=img_size, dtype=dtype, **kw)
