"""Bilinear resize with PyTorch ``align_corners=False`` semantics.

The reference upsamples with ``nn.functional.interpolate(mode='bilinear',
align_corners=False)`` throughout the decoders (``Models/Decoders.py:144,196``,
``mdvit.py:699``). PyTorch's align_corners=False uses half-pixel source
coordinates — the same convention as ``jax.image.resize`` — so a thin wrapper
suffices; parity is pinned by ``tests/test_ops_parity.py`` against torch.

``antialias`` defaults to False to match torch/cv2 (jax defaults True, which
would change downscaling results).
"""
from __future__ import annotations

from functools import lru_cache
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def resize_bilinear(
    x: jax.Array, size: Sequence[int], antialias: bool = False
) -> jax.Array:
    """Resize NHWC ``(B, H, W, C)`` to ``(B, size[0], size[1], C)``.

    No-ops when the spatial shape already matches (the reference's decoders
    frequently "resize" to the identical shape).
    """
    h, w = int(size[0]), int(size[1])
    if x.shape[1] == h and x.shape[2] == w:
        return x
    out_shape = (x.shape[0], h, w, x.shape[3])
    dtype = x.dtype
    # interpolate in f32: bf16 accumulation of the 4-tap blend loses parity
    y = jax.image.resize(
        x.astype(jnp.float32), out_shape, method="bilinear", antialias=antialias
    )
    return y.astype(dtype)


@lru_cache(maxsize=None)
def _ac_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Bilinear interpolation matrix (out, in) with torch
    ``align_corners=True`` source coordinates: s = o·(in−1)/(out−1)."""
    m = np.zeros((out_size, in_size), np.float32)
    if out_size == 1:
        m[0, 0] = 1.0
        return m
    scale = (in_size - 1) / (out_size - 1)
    for o in range(out_size):
        s = o * scale
        s0 = int(np.floor(s))
        f = s - s0
        s0 = min(s0, in_size - 1)
        s1 = min(s0 + 1, in_size - 1)
        m[o, s0] += 1.0 - f
        m[o, s1] += f
    return m


def resize_bilinear_align_corners(x: jax.Array, size: Sequence[int]) -> jax.Array:
    """torch ``align_corners=True`` bilinear resize, NHWC.

    UTNet interpolates with align_corners=True (``conv_trans_utils.py:188``,
    ``unet_utils.py:303``). Implemented as two small matmuls (separable
    interpolation matrices) — MXU-friendly, unlike a gather lowering.
    """
    h, w = int(size[0]), int(size[1])
    if x.shape[1] == h and x.shape[2] == w:
        return x
    my = jnp.asarray(_ac_resize_matrix(x.shape[1], h))
    mx = jnp.asarray(_ac_resize_matrix(x.shape[2], w))
    dtype = x.dtype
    y = jnp.einsum("Hh,bhwc->bHwc", my, x.astype(jnp.float32))
    y = jnp.einsum("Ww,bhwc->bhWc", mx, y)
    return y.astype(dtype)
