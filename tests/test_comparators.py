"""Comparator zoo shape/contract tests (tiny configs, CPU).

Mirrors the reference's per-model ``__main__`` smoke blocks
(``SwinUnet.py:837``, ``UTNet.py:109``, ``TransFuse.py:656``,
``base_sota_adapt.py:641``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdvit_tpu.models.swin_unet import SwinUnet
from mdvit_tpu.models.swin_unetr import SwinUNETR
from mdvit_tpu.models.transfuse import TransFuse
from mdvit_tpu.models.utnet import UTNet
from mdvit_tpu.models.base import BASE

RNGS = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}


def test_swin_unet_tiny():
    m = SwinUnet(img_size=32, embed_dim=8, depths=(1, 1, 1, 1),
                 num_heads=(1, 2, 4, 8), window=4)
    x = jnp.zeros((2, 32, 32, 3))
    v = jax.jit(lambda: m.init(RNGS, x, train=False))()
    out = jax.jit(lambda v: m.apply(v, x, train=False))(v)
    assert out["seg"].shape == (2, 32, 32, 1)
    assert out["feat"].shape == (2, 64)


def test_swin_unet_shifted_window_mask_changes_output():
    """Shifted blocks must attend differently from unshifted ones."""
    from mdvit_tpu.models.swin_unet import SwinBlock

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 8))
    blk0 = SwinBlock(dim=8, input_resolution=(8, 8), num_heads=2, window=4,
                     shift=0)
    blk1 = SwinBlock(dim=8, input_resolution=(8, 8), num_heads=2, window=4,
                     shift=2)
    v = blk0.init(RNGS, x, False)
    out0 = blk0.apply(v, x, False)
    out1 = blk1.apply(v, x, False)  # same params, shifted partition
    assert not np.allclose(np.asarray(out0), np.asarray(out1))


def test_utnet_tiny():
    m = UTNet(base_chan=4, reduce_size=2, num_heads=(2, 2, 2, 2))
    x = jnp.zeros((2, 32, 32, 3))
    v = jax.jit(lambda: m.init(RNGS, x, train=False))()
    out = jax.jit(lambda v: m.apply(v, x, train=False))(v)
    assert out["seg"].shape == (2, 32, 32, 1)
    assert out["feat"].shape == (2, 64)


def test_transfuse_l_384_registered_geometry():
    """TransFuse_L_384 (``TransFuse.py:394-496``): fixed non-square 384×512
    input, (24, 32) token grid, three full-resolution maps. Traced with
    eval_shape — the full resnet50+DeiT-base graph never executes on CPU."""
    from mdvit_tpu.models.registry import get_model

    m = get_model("TransFuse_L_384")
    x = jax.ShapeDtypeStruct((1, 384, 512, 3), jnp.float32)
    oh = jax.ShapeDtypeStruct((1, 4), jnp.float32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    out_shape, var_shape = jax.eval_shape(
        lambda k, xx, oo: m.init_with_output(
            {"params": k, "dropout": k}, xx, oo, train=False), key, x, oh)
    for mp in out_shape["seg"]:
        assert mp.shape == (1, 384, 512, 1)
    # DeiT-base pos-embed at the reference's interpolated (24, 32) grid
    pe = var_shape["params"]["transformer"]["pos_embed"]
    assert pe.shape == (1, 24 * 32, 768)
    # resnet50 bottleneck stage widths reach layer3 = 1024 channels
    l3 = var_shape["params"]["resnet"]["layer3_0"]["conv3"]["kernel"]
    assert l3.shape[-1] == 1024


def test_transfuse_nonsquare_tiny_runs():
    """Non-square geometry executes end-to-end at miniature scale."""
    m = TransFuse(img_size=(32, 64), variant="S", sup=False)
    x = jnp.zeros((1, 32, 64, 3))
    v = jax.jit(lambda: m.init(RNGS, x, None, train=False))()
    out = jax.jit(lambda v: m.apply(v, x, None, train=False))(v)
    for mp in out["seg"]:
        assert mp.shape == (1, 32, 64, 1)


def test_transfuse_tiny_shapes_and_sup():
    m = TransFuse(img_size=32, variant="S", sup=True, num_domains=4)
    x = jnp.zeros((2, 32, 32, 3))
    oh = jnp.asarray(np.eye(4, dtype=np.float32)[[0, 2]])
    v = jax.jit(lambda: m.init(RNGS, x, oh, train=False))()
    out = jax.jit(lambda v: m.apply(v, x, oh, train=False))(v)
    map_x, map_1, map_2 = out["seg"]
    assert map_x.shape == (2, 32, 32, 1)
    assert map_1.shape == (2, 32, 32, 1)
    assert map_2.shape == (2, 32, 32, 1)
    # Sup gate: different domain → different output
    x2 = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))
    oh_b = jnp.asarray(np.eye(4, dtype=np.float32)[[1, 1]])
    oh_a = jnp.asarray(np.eye(4, dtype=np.float32)[[3, 3]])
    out_a = np.asarray(m.apply(v, x2, oh_a, train=False)["seg"][2])
    out_b = np.asarray(m.apply(v, x2, oh_b, train=False)["seg"][2])
    assert not np.allclose(out_a, out_b)


def test_swin_unetr_tiny():
    m = SwinUNETR(img_size=32, feature_size=4, depths=(1, 1, 1, 1),
                  num_heads=(1, 2, 4, 8), window=4)
    x = jnp.zeros((2, 32, 32, 3))
    v = jax.jit(lambda: m.init(RNGS, x, train=False))()
    out = jax.jit(lambda v: m.apply(v, x, train=False))(v)
    assert out["seg"].shape == (2, 32, 32, 1)


def test_dase_use_adapters_tiny():
    tiny = dict(img_size=32, num_layers=(1, 1, 1, 1),
                embed_dims=(8, 16, 16, 24), mlp_ratios=(1, 1, 1, 1),
                num_heads=(8, 8, 8, 8))
    for adapter in ("DASE", "USE"):
        m = BASE(adapter=adapter, **tiny)
        x = jnp.zeros((2, 32, 32, 3))
        v = jax.jit(lambda m=m: m.init(RNGS, x, None, False))()
        out = jax.jit(lambda v, m=m: m.apply(v, x, None, False))(v)
        assert out["seg"].shape == (2, 32, 32, 1)
