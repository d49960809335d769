"""Fused factorized-attention kernel vs the XLA reference path.

On CPU the Pallas TPU kernel runs in interpreter mode (slow — tiny shapes
only); the TPU compiled path is exercised by bench.py and the perf scripts.
"""
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from mdvit_tpu.ops import pallas_attention as pa

# interpreter-mode Pallas on CPU takes >5 min per tiny case on this host —
# the kernel-vs-XLA equivalence is validated on real TPU by
# scripts/validate_pallas.py; opt in here with MDVIT_RUN_PALLAS_INTERP=1.
_interp = pytest.mark.skipif(
    os.environ.get("MDVIT_RUN_PALLAS_INTERP", "0") != "1",
    reason="pallas interpreter mode too slow on 1-core CPU host",
)


@_interp
@pytest.mark.parametrize("b,n,c,ch", [(2, 64, 16, 8)])
def test_pallas_matches_xla_forward(b, n, c, ch):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, n, c))
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, n, c))
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, n, c))
    scale = ch ** -0.5
    with pltpu.force_tpu_interpret_mode():
        got = pa.factorized_attention(q, k, v, ch, scale)
    want = pa.factorized_attention_xla(q, k, v, ch, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@_interp
def test_pallas_matches_xla_grads():
    b, n, c, ch = 1, 32, 16, 8
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (b, n, c))
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, n, c))
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, n, c))
    scale = ch ** -0.5

    def loss(fn, q, k, v):
        return jnp.sum(jnp.tanh(fn(q, k, v, ch, scale)))

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(functools.partial(loss, pa.factorized_attention),
                      argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(functools.partial(loss, pa.factorized_attention_xla),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_xla_path_blockdiag_equals_per_head():
    """The block-masked full-width matmul must equal per-head einsums."""
    b, n, h, ch = 2, 48, 4, 8
    c = h * ch
    key = jax.random.PRNGKey(5)
    q = jax.random.normal(key, (b, n, c))
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, n, c))
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, n, c))
    got = pa.factorized_attention_xla(q, k, v, ch, 1.0)
    qh = q.reshape(b, n, h, ch)
    kh = k.reshape(b, n, h, ch)
    vh = v.reshape(b, n, h, ch)
    ks = jax.nn.softmax(kh, axis=1)
    ktv = jnp.einsum("bnhk,bnhv->bhkv", ks, vh)
    want = jnp.einsum("bnhk,bhkv->bnhv", qh, ktv).reshape(b, n, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
