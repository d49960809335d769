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
from mdvit_tpu.ops.pallas_dwconv import (
    cpe_conv_pallas,
    cpe_conv_xla,
    crpe_conv_pallas,
    crpe_conv_xla,
)


def validate_dwconv(key) -> bool:
    """CPE/CRPE Pallas kernels vs the XLA composite at every MDViT stage
    shape (fwd + grads). Compared under ``highest`` matmul precision: the
    Pallas kernels accumulate in true fp32 while XLA's *default*-precision
    TPU conv is bf16 — at default precision the XLA side is the inaccurate
    one (CPE diffs ~2e-3 with exact-fp32 agreement elsewhere)."""
    ok = True
    for (b, h, w, c) in [(16, 64, 64, 64), (16, 32, 32, 128),
                         (16, 16, 16, 320), (16, 8, 8, 512)]:
        for k in (3, 7):
            for tag in ("cpe", "crpe"):
                x = jax.random.normal(key, (b, h, w, c), jnp.float32)
                q = jax.random.normal(jax.random.fold_in(key, 9),
                                      (b, h, w, c))
                wgt = 0.3 * jax.random.normal(
                    jax.random.fold_in(key, 1), (k, k, c), jnp.float32)
                bia = 0.1 * jax.random.normal(
                    jax.random.fold_in(key, 2), (c,), jnp.float32)
                if tag == "cpe":
                    rp = jax.jit(lambda x, w_, b_, q_: cpe_conv_pallas(
                        x, w_, b_))
                    rx = jax.jit(lambda x, w_, b_, q_: cpe_conv_xla(
                        x, w_, b_))
                else:
                    rp = jax.jit(lambda x, w_, b_, q_: crpe_conv_pallas(
                        q_, x, w_, b_))
                    rx = jax.jit(lambda x, w_, b_, q_: crpe_conv_xla(
                        q_, x, w_, b_))
                fp = jax.jit(lambda x, w_, b_, q_, f=rp: jnp.sum(
                    jnp.sin(f(x, w_, b_, q_))))
                fx = jax.jit(lambda x, w_, b_, q_, f=rx: jnp.sum(
                    jnp.sin(f(x, w_, b_, q_))))
                with jax.default_matmul_precision("highest"):
                    # element-wise forward check (a reduced-scalar compare
                    # lets per-element errors cancel)
                    d_fwd = float(jnp.abs(rp(x, wgt, bia, q)
                                          - rx(x, wgt, bia, q)).max())
                    gp = jax.jit(jax.grad(fp, argnums=(0, 1, 2, 3)))(
                        x, wgt, bia, q)
                    gx = jax.jit(jax.grad(fx, argnums=(0, 1, 2, 3)))(
                        x, wgt, bia, q)
                # dw/db are B·H·W-element reductions: both sides are fp32 but
                # accumulate in different orders (VPU tree vs MXU conv), so
                # compare relative to each gradient's own scale. Expected
                # noise ≈ eps·sqrt(n) ~ 3e-5 at n=65k; logic bugs are ≥1e-2
                # relative. The forward stays bit-exact (no reductions).
                drel = max(
                    float(jnp.abs(a - e).max())
                    / max(float(jnp.abs(e).max()), 1e-20)
                    for a, e in zip(gp, gx)
                )
                good = d_fwd < 1e-3 and drel < 1e-4
                ok = ok and good
                print(f"dwconv {tag} k={k} ({b},{h},{w},{c}) "
                      f"fwd diff {d_fwd:.2e} grad rel diff {drel:.2e} "
                      f"{'OK' if good else 'FAIL'}")
    return ok


def main():
    key = jax.random.PRNGKey(0)
    ok = validate_dwconv(key)
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
