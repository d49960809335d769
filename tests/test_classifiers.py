"""MPViT / CoaT classification backbones (C31/C29): shapes + param parity.

Published parameter counts (reference docstrings ``mpvit.py:710-810`` and the
CoaT paper): mpvit_tiny 5.84M, coat_lite_tiny ~5.7M, coat_tiny ~5.5M — all at
1000 classes. Verified via eval_shape (no computation).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdvit_tpu.models.coat import CoaT
from mdvit_tpu.models.mpvit import MPViT

RNGS = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}


def _n_params(model, img=64):
    shapes = jax.eval_shape(
        lambda: model.init(RNGS, jnp.zeros((1, img, img, 3)), train=False))
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(shapes["params"]))


def test_mpvit_tiny_param_count_matches_published():
    m = MPViT(num_classes=1000)
    n = _n_params(m)
    assert abs(n - 5_843_736) / 5_843_736 < 0.01, n


def test_coat_lite_tiny_params_and_structure():
    m = CoaT(embed_dims=(64, 128, 256, 320), serial_depths=(2, 2, 2, 2),
             parallel_depth=0, mlp_ratios=(8, 8, 4, 4), num_classes=1000)
    n = _n_params(m)
    assert 5.5e6 < n < 6.0e6, n


def test_coat_tiny_params():
    m = CoaT(embed_dims=(152, 152, 152, 152), serial_depths=(2, 2, 2, 2),
             parallel_depth=6, mlp_ratios=(4, 4, 4, 4), num_classes=1000)
    n = _n_params(m)
    assert 5.2e6 < n < 5.8e6, n


def test_mpvit_tiny_forward():
    m = MPViT(num_classes=7, embed_dims=(16, 16, 16, 16),
              num_layers=(1, 1, 1, 1), num_path=(2, 2, 2, 2),
              mlp_ratios=(1, 1, 1, 1))
    x = jnp.zeros((2, 32, 32, 3))
    v = jax.jit(lambda: m.init(RNGS, x, train=False))()
    out = jax.jit(lambda v: m.apply(v, x, train=False))(v)
    assert out["logits"].shape == (2, 7)


def test_coat_parallel_forward():
    m = CoaT(embed_dims=(16, 16, 16, 16), serial_depths=(1, 1, 1, 1),
             parallel_depth=1, mlp_ratios=(1, 1, 1, 1), num_classes=7)
    x = jnp.zeros((2, 32, 32, 3))
    v = jax.jit(lambda: m.init(RNGS, x, train=False))()
    out = jax.jit(lambda v: m.apply(v, x, train=False))(v)
    assert out["logits"].shape == (2, 7)
    assert np.all(np.isfinite(np.asarray(out["logits"])))


def test_swin_tiny_param_count_matches_published():
    # Swin-T: 28.3M params at 1000 classes (Swin_transformer.py:478 defaults)
    from mdvit_tpu.models.swin_unet import SwinClassifier
    m = SwinClassifier(num_classes=1000)
    shapes = jax.eval_shape(
        lambda: m.init(RNGS, jnp.zeros((1, 224, 224, 3)), train=False))
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(shapes["params"]))
    assert abs(n - 28_288_354) / 28_288_354 < 0.01, n


def test_swin_classifier_forward():
    from mdvit_tpu.models.swin_unet import SwinClassifier
    m = SwinClassifier(img_size=32, num_classes=7, embed_dim=24,
                       depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2),
                       window=4, ape=True)
    x = jnp.zeros((2, 32, 32, 3))
    v = jax.jit(lambda: m.init(RNGS, x, train=False))()
    out = jax.jit(lambda v: m.apply(v, x, train=False))(v)
    assert out["logits"].shape == (2, 7)
    assert out["feat"].shape == (2, 24 * 8)
