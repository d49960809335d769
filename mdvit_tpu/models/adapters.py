"""SE-style universal-adapter modules (comparators C26-C28).

Reference: ``Models/Sota_adapters/se_module_vector.py:8-31`` (SELayer),
``domain_attention_module.py:19-66`` (DomainAttention — input-conditioned
mixture of N sigmoid-free SE layers weighted by a softmaxed per-image dataset
assignment, then one sigmoid gate), ``base_sota_adapt.py:628-637`` (SEBlock,
USE-Net style ``se·x + x``), and ``residual_adapter_module.py`` (Rebuffi
series/parallel residual adapters).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mdvit_tpu.ops.layers import NormSpec, conv2d, dense, make_bn


class SELayer(nn.Module):
    """Squeeze-and-excitation vector: pool → fc → relu → fc (→ sigmoid)."""

    channel: int
    reduction: int = 16
    with_sigmoid: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = jnp.mean(x, axis=(1, 2))  # (B, C)
        y = dense(self.channel // self.reduction, dtype=self.dtype,
                  name="fc1")(y)
        y = jax.nn.relu(y)
        y = dense(self.channel, dtype=self.dtype, name="fc2")(y)
        if self.with_sigmoid:
            y = jax.nn.sigmoid(y)
        return y[:, None, None, :]  # (B,1,1,C)


class SEBlock(nn.Module):
    """USE-Net adapter: ``se(x)·x + x`` (``base_sota_adapt.py:628-637``)."""

    channel: int
    reduction: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        se = SELayer(self.channel, self.reduction, with_sigmoid=True,
                     dtype=self.dtype, name="se_layer")(x)
        return se * x + x


class DomainAttention(nn.Module):
    """Domain-attentive SE adapter (DASE): N sigmoid-free SE vectors mixed by
    a softmax over a learned per-image dataset assignment, sigmoided, then
    multiplied into x. No domain label is consumed — fully input-conditioned
    (``domain_attention_module.py:51-66``)."""

    planes: int
    reduction: int = 16
    num_adapters: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b = x.shape[0]
        pooled = jnp.mean(x, axis=(1, 2))  # (B, C)
        weight = dense(self.num_adapters, dtype=self.dtype, name="fc_1")(pooled)
        weight = jax.nn.softmax(weight.astype(jnp.float32), axis=1)  # (B, N)
        ses = [
            SELayer(self.planes, self.reduction, with_sigmoid=False,
                    dtype=self.dtype, name=f"se{i}")(x)[:, 0, 0, :]
            for i in range(self.num_adapters)
        ]
        mat = jnp.stack(ses, axis=-1)  # (B, C, N)
        mixed = jnp.einsum("bcn,bn->bc", mat, weight.astype(mat.dtype))
        gate = jax.nn.sigmoid(mixed)[:, None, None, :]
        return x * gate


class ResidualAdapter(nn.Module):
    """Rebuffi-style residual adapter: per-task 1×1 conv (+BN), used in
    series (``y = x + bn(conv1x1(x))``) or parallel with a host conv
    (``Sota_adapters/residual_adapter_module.py:23-60``). The per-task
    ModuleList becomes a domain-stacked conv selected by one-hot."""

    channel: int
    num_domains: int = 4
    mode: str = "series"  # 'series' | 'parallel'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, domain_onehot: jax.Array, train: bool = False
    ) -> jax.Array:
        # domain-stacked 1x1 convs == per-sample weight gather + matmul
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (self.num_domains, x.shape[-1], self.channel),
        )
        w = jnp.einsum("bd,dio->bio", domain_onehot.astype(kernel.dtype), kernel)
        y = jnp.einsum("bhwi,bio->bhwo", x.astype(w.dtype), w).astype(x.dtype)
        y = make_bn(
            self.channel,
            NormSpec(num_domains=self.num_domains, dsn=True),
            self.dtype, name="bn",
        )(y, domain_onehot, use_running_average=not train)
        if self.mode == "series":
            return x + y
        return y  # parallel: caller adds to the host conv output
