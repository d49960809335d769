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

from typing import Sequence

import jax
import jax.numpy as jnp


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
