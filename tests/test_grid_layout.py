"""Grid-layout MHSA ≡ token-layout MHSA.

The stage/block/attention modules accept both the flat ``(B, N, C)`` token
layout (CP shard_map bodies, CoaT CLS paths) and the conv-native
``(B, H, W, C)`` grid layout (the encoder/decoder hot path, which avoids
the per-block token relayout copies measured at 7 ms/step on v5e). Both
forms must share one parameter tree and identical numerics — this pins the
invariant the round-3 perf work relies on.
"""
import jax
import jax.numpy as jnp
import numpy as np

from mdvit_tpu.models.blocks import MHSAStage

B, H, W, DIM, HEADS = 2, 16, 16, 64, 8


def _stage(sup, dsn):
    return MHSAStage(
        dim=DIM, num_layers=2, num_heads=HEADS, mlp_ratio=4.0,
        sup=sup, dsn=dsn, num_domains=4, drop=0.0,
    )


def _data(seed=0):
    x = jax.random.normal(jax.random.PRNGKey(seed), (B, H, W, DIM),
                          jnp.float32)
    dom = jax.nn.one_hot(jnp.array([1, 3]), 4)
    return x, dom


def test_grid_equals_tokens_params_and_values():
    for sup, dsn in [(False, False), (True, False), (True, True)]:
        stage = _stage(sup, dsn)
        x, dom = _data()
        params = jax.jit(
            lambda k, xg: stage.init(k, xg, (H, W), dom, False)
        )(jax.random.PRNGKey(1), x)
        tok = jax.jit(
            lambda p, xt: stage.apply(p, xt, (H, W), dom, False)
        )(params, x.reshape(B, H * W, DIM))
        grid = jax.jit(
            lambda p, xg: stage.apply(p, xg, (H, W), dom, False)
        )(params, x)
        assert grid.shape == (B, H, W, DIM)
        np.testing.assert_allclose(
            np.asarray(grid).reshape(B, H * W, DIM), np.asarray(tok),
            rtol=0, atol=2e-5,
        )


def test_grid_gradients_equal_tokens():
    stage = _stage(True, False)
    x, dom = _data(3)
    params = jax.jit(
        lambda k, xg: stage.init(k, xg, (H, W), dom, False)
    )(jax.random.PRNGKey(2), x)

    def loss_tok(p):
        out = stage.apply(p, x.reshape(B, H * W, DIM), (H, W), dom, False)
        return jnp.sum(out ** 2)

    def loss_grid(p):
        out = stage.apply(p, x, (H, W), dom, False)
        return jnp.sum(out ** 2)

    g_tok = jax.jit(jax.grad(loss_tok))(params)
    g_grid = jax.jit(jax.grad(loss_grid))(params)
    # the grid form contracts (H, W) in a different reduction order than the
    # token form's N — allow fp32 reduction-order noise, nothing more
    for a, b in zip(jax.tree.leaves(g_tok), jax.tree.leaves(g_grid)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)
