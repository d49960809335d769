"""Pins the refit tanh-path GELU (ops/layers.py:fast_gelu) to the exact
erf form it replaces on the production bf16 path.

The reference activation is torch ``nn.GELU()`` = x·Φ(x) (exact erf; e.g.
``Models/Transformer/mpvit.py`` Mlp act_layer default). ``MDVIT_GELU=auto``
keeps exact erf for fp32 inputs — the torch-parity suites are untouched —
and substitutes the fitted form only for bf16 inputs, where this file shows
the substitution is at the same accuracy class as XLA's own erf-on-bf16
evaluation. The fitted form must keep the exact
``jax.nn.gelu(approximate=True)`` graph structure (only the constants are
refit): any structural deviation falls off XLA:TPU's fast lowering — see
the measurement table in the ops/layers.py module comment.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdvit_tpu.ops.layers import _gelu, fast_gelu, get_act


def exact_gelu_f64(x: np.ndarray) -> np.ndarray:
    from scipy.special import erf

    return x * 0.5 * (1.0 + erf(x / np.sqrt(2.0)))


def exact_gelu_grad_f64(x: np.ndarray) -> np.ndarray:
    from scipy.special import erf

    phi = np.exp(-x * x / 2.0) / math.sqrt(2.0 * math.pi)
    return 0.5 * (1.0 + erf(x / np.sqrt(2.0))) + x * phi


@pytest.fixture(scope="module")
def grid():
    return np.linspace(-12.0, 12.0, 200_001)


def test_f32_forward_error(grid):
    out = fast_gelu(jnp.asarray(grid, jnp.float32))
    err = np.max(np.abs(np.asarray(out, np.float64) - exact_gelu_f64(grid)))
    # Minimax fit bound is 2.71e-4; the stock Hendrycks constants give 4.7e-4.
    assert err < 3e-4, err


def test_f32_gradient_error():
    # Coarser grid: vmap(grad) per point.
    x = np.linspace(-8.0, 8.0, 20_001)
    g = jax.vmap(jax.grad(fast_gelu))(jnp.asarray(x, jnp.float32))
    err = np.max(np.abs(np.asarray(g, np.float64) - exact_gelu_grad_f64(x)))
    assert err < 1e-3, err


def test_tails_saturate_exactly():
    # a > 0 keeps the tanh argument monotone (no clamp needed) and f32 tanh
    # saturates to exactly ±1 well before |x|=8, so large activations pass
    # through exactly: gelu(x)=x for x>=8, 0 for x<=-8 — and no overflow or
    # NaN for extreme inputs (x**3 may overflow to inf inside tanh only).
    x = jnp.asarray([8.0, 9.0, 100.0, 1e6, 1e13], jnp.float32)
    np.testing.assert_array_equal(np.asarray(fast_gelu(x)), np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(fast_gelu(-x)), np.zeros_like(np.asarray(x))
    )
    g = jax.vmap(jax.grad(fast_gelu))(jnp.asarray([9.0, -9.0, 1e6], jnp.float32))
    np.testing.assert_array_equal(np.asarray(g),
                                  np.asarray([1.0, 0.0, 1.0], np.float32))


def test_bf16_equivalence(grid):
    """On bf16 tensors the fitted form deviates from the true GELU by no
    more than XLA's own erf-on-bf16 rounding does (~1e-2 absolute = half a
    bf16 ulp at O(1) values), and stays within 2 ulp wherever the output is
    not tiny. The known behavioral difference: deep-negative-tail outputs
    (|gelu| < ~6e-3) can flush toward 0 where bf16 tanh saturates early —
    half a bf16 ulp at unit activation scale."""
    xb = jnp.asarray(grid, jnp.float32).astype(jnp.bfloat16)
    x64 = np.asarray(xb, np.float64)
    exact = exact_gelu_f64(x64)

    p = np.asarray(fast_gelu(xb), np.float64)
    e = np.asarray(jax.nn.gelu(xb, approximate=False), np.float64)

    p_abs = np.max(np.abs(p - exact))
    e_abs = np.max(np.abs(e - exact))
    assert p_abs <= e_abs + 2 ** -9, (p_abs, e_abs)

    # Relative (ulp) accuracy away from the tiny-output flush region:
    # bf16 arithmetic noise puts BOTH forms at a few ulp (measured: fitted
    # 8.9, erf-on-bf16 5.1) — same accuracy class, bounded at 2× the erf
    # form's own worst case.
    big = np.abs(exact) >= 0.0625
    ulp = 2.0 ** (np.floor(np.log2(np.abs(exact[big]))) - 8)
    p_worst = np.max(np.abs(p[big] - exact[big]) / ulp)
    e_worst = np.max(np.abs(e[big] - exact[big]) / ulp)
    assert p_worst <= 2.0 * e_worst, (p_worst, e_worst)

    # The flush region itself stays below half a bf16 ulp at unit scale.
    assert np.max(np.abs(p[~big] - exact[~big])) <= 2 ** -8


def test_auto_dispatch_fp32_is_exact_erf():
    # MDVIT_GELU default (auto): fp32 path must be bit-identical to
    # jax.nn.gelu(approximate=False) — the torch-parity contract.
    x = jnp.asarray(np.random.RandomState(0).randn(4096), jnp.float32)
    act = get_act("gelu")
    np.testing.assert_array_equal(
        np.asarray(act(x)), np.asarray(jax.nn.gelu(x, approximate=False))
    )


def test_auto_dispatch_bf16_is_fast():
    x = jnp.asarray(np.random.RandomState(1).randn(4096), jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(_gelu(x), np.float32),
                                  np.asarray(fast_gelu(x), np.float32))
    assert _gelu(x).dtype == jnp.bfloat16


def test_structure_matches_jax_graph():
    """The jaxpr of fast_gelu must contain the same primitive sequence as
    jax.nn.gelu(approximate=True) (the XLA:TPU fast-lowering contract) —
    in particular integer_pow(3) and tanh, and no clamp/select/erf."""
    prims = {str(e.primitive)
             for e in jax.make_jaxpr(fast_gelu)(jnp.ones((4,), jnp.bfloat16)).eqns}
    ref = {str(e.primitive)
           for e in jax.make_jaxpr(
               lambda v: jax.nn.gelu(v, approximate=True)
           )(jnp.ones((4,), jnp.bfloat16)).eqns}
    assert prims == ref, (prims, ref)
