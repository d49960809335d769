"""Interpret-mode parity of the Pallas CPE/CRPE depthwise-conv kernels.

Runs the Pallas kernels (ops/pallas_dwconv.py) through the Pallas interpreter
on CPU against the XLA composite (the exact math the production XLA path
uses), forward and backward, for both kernel sizes used by the model (CPE 3,
CRPE 7). Real-TPU validation at production shapes: scripts/validate_pallas.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdvit_tpu.ops.pallas_dwconv import (
    cpe_conv_pallas,
    cpe_conv_xla,
    crpe_conv_pallas,
    crpe_conv_xla,
)


def _rand(key, shape, scale=1.0):
    return scale * jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize("k", [3, 7])
def test_cpe_conv_interpret_matches_xla(k):
    key = jax.random.PRNGKey(0)
    b, h, w, c = 2, 8, 8, 16
    x = _rand(key, (b, h, w, c))
    wgt = _rand(jax.random.fold_in(key, 1), (k, k, c), 0.3)
    bia = _rand(jax.random.fold_in(key, 2), (c,), 0.1)

    out_p = cpe_conv_pallas(x, wgt, bia, True)
    out_x = cpe_conv_xla(x, wgt, bia)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)

    def loss_p(x, wgt, bia):
        return jnp.sum(jnp.sin(cpe_conv_pallas(x, wgt, bia, True)))

    def loss_x(x, wgt, bia):
        return jnp.sum(jnp.sin(cpe_conv_xla(x, wgt, bia)))

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, wgt, bia)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(x, wgt, bia)
    for a, e in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k", [3, 7])
def test_crpe_conv_interpret_matches_xla(k):
    key = jax.random.PRNGKey(3)
    b, h, w, c = 2, 8, 8, 16
    q = _rand(key, (b, h, w, c))
    v = _rand(jax.random.fold_in(key, 1), (b, h, w, c))
    wgt = _rand(jax.random.fold_in(key, 2), (k, k, c), 0.3)
    bia = _rand(jax.random.fold_in(key, 3), (c,), 0.1)

    out_p = crpe_conv_pallas(q, v, wgt, bia, True)
    out_x = crpe_conv_xla(q, v, wgt, bia)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)

    def loss_p(q, v, wgt, bia):
        return jnp.sum(jnp.sin(crpe_conv_pallas(q, v, wgt, bia, True)))

    def loss_x(q, v, wgt, bia):
        return jnp.sum(jnp.sin(crpe_conv_xla(q, v, wgt, bia)))

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(q, v, wgt, bia)
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3))(q, v, wgt, bia)
    for a, e in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-4)
