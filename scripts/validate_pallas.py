#!/usr/bin/env python
"""Validate the fused Pallas factorized-attention kernel against the XLA path
on real TPU (fwd + grads at every MDViT stage shape) and report timings.

Run on a TPU host: ``python scripts/validate_pallas.py``.
(CPU interpreter-mode equivalents exist in tests/test_pallas_attention.py but
are opt-in — interpret mode is minutes-per-case on a 1-core host.)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from mdvit_tpu.ops.pallas_attention import (
    factorized_attention,
    factorized_attention_xla,
)


def main():
    key = jax.random.PRNGKey(0)
    ok = True
    for (b, n, c, ch) in [(16, 4096, 64, 8), (16, 1024, 128, 16),
                          (16, 256, 320, 40), (16, 64, 512, 64)]:
        q = jax.random.normal(key, (b, n, c), jnp.float32)
        k = jax.random.normal(jax.random.fold_in(key, 1), (b, n, c))
        v = jax.random.normal(jax.random.fold_in(key, 2), (b, n, c))
        scale = ch ** -0.5
        fp = jax.jit(lambda q, k, v: factorized_attention(q, k, v, ch, scale))
        fx = jax.jit(
            lambda q, k, v: factorized_attention_xla(q, k, v, ch, scale))
        d_fwd = float(jnp.abs(fp(q, k, v) - fx(q, k, v)).max())
        gp = jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(jnp.sin(
                factorized_attention(q, k, v, ch, scale))), argnums=(0, 1, 2)))
        gx = jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(jnp.sin(
                factorized_attention_xla(q, k, v, ch, scale))),
            argnums=(0, 1, 2)))
        dmax = max(
            float(jnp.abs(a - b_).max()) for a, b_ in zip(gp(q, k, v),
                                                          gx(q, k, v)))
        good = d_fwd < 1e-3 and dmax < 2e-2
        ok = ok and good
        print(f"({b},{n},{c}) fwd diff {d_fwd:.2e} grad diff {dmax:.2e} "
              f"{'OK' if good else 'FAIL'}")
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
