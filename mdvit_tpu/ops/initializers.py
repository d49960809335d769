"""Weight initializers matching the reference's effective init.

``MDViT._init_weights`` (``Models/Transformer/mdvit.py:648-664``) is applied
to every module after construction, so the *effective* init (overriding the
per-block constructor inits) is:

* Conv2d:  normal(0, sqrt(2 / (k_h·k_w·out_ch/groups))), bias 0
* Linear:  trunc_normal(std=0.02) — timm truncates at ±2.0 in value space,
  i.e. ±100σ for σ=0.02, so a plain normal(0, 0.02) is distributionally
  identical; bias 0
* LayerNorm / BatchNorm: weight 1, bias 0
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def conv_kaiming_fanout(groups: int = 1):
    """normal(0, sqrt(2/fan_out)), fan_out = kh·kw·out_ch/groups.

    Flax conv kernels are ``(kh, kw, in_ch/groups, out_ch)``.
    """

    def init(key, shape, dtype=jnp.float32):
        kh, kw = shape[0], shape[1]
        out_ch = shape[-1]
        fan_out = kh * kw * out_ch // max(groups, 1)
        std = (2.0 / fan_out) ** 0.5
        return std * jax.random.normal(key, shape, dtype)

    return init


def dense_trunc_normal(std: float = 0.02):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init
