"""Flat-fused AdamW: one vectorized update instead of ~400 per-leaf kernels.

NOT the production default. Benchmarks on v5e (bench_opt experiments, round
2): in ISOLATION flat is 4.3× faster than ``optax.adamw`` (19.3 → 4.5 ms on
MDViT's 390-leaf/35M-param tree — optax's per-leaf map costs ~50 µs/leaf
without donation), but INSIDE the jitted train step it REGRESSED the full
step 282.7 → 266.8 img/s: the two raveling concats force every grad leaf to
stay live until the barrier, while per-leaf updates let XLA free each grad
right after its update and interleave the optimizer with the backward
schedule. Kept as an option for trees with very many tiny leaves and for
host-side / non-fused use.

The moments live as ONE flat fp32 vector; ``update`` ravels the grad/param
trees (two fused concats), runs the AdamW math as a single elementwise kernel
chain over the flat vector, and unravels the updates.

Math is bit-identical to ``optax.adamw`` / ``torch.optim.AdamW`` (decoupled
weight decay, reference recipe ``multi_train_MDViT.py:92-94``):

  m ← β₁·m + (1−β₁)·g;  v ← β₂·v + (1−β₂)·g²
  update = −lr·( m̂ / (√v̂ + eps) + wd·p )

The flat layout is the ``jax.flatten_util.ravel_pytree`` order of the grads
tree, which equals the params tree order.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree


class FlatAdamState(NamedTuple):
    count: jax.Array  # int32 step counter
    m: jax.Array  # (n,) fp32 first moment
    v: jax.Array  # (n,) fp32 second moment


def flat_adamw(
    learning_rate: Union[float, Callable],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """AdamW over the raveled parameter vector. ``weight_decay=0`` is Adam."""

    def init_fn(params):
        flat, _ = ravel_pytree(params)
        n = flat.size
        return FlatAdamState(
            count=jnp.zeros((), jnp.int32),
            m=jnp.zeros((n,), jnp.float32),
            v=jnp.zeros((n,), jnp.float32),
        )

    def update_fn(grads, state, params=None):
        g, unravel = ravel_pytree(grads)
        g = g.astype(jnp.float32)
        count = optax.safe_int32_increment(state.count)
        m = state.m * b1 + g * (1.0 - b1)
        v = state.v * b2 + (g * g) * (1.0 - b2)
        # bias correction identical to optax.scale_by_adam
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)
        mhat = m / c1
        vhat = v / c2
        upd = mhat / (jnp.sqrt(vhat) + eps)
        if weight_decay != 0.0:
            p, _ = ravel_pytree(params)
            upd = upd + weight_decay * p.astype(jnp.float32)
        # schedules evaluate at the PRE-increment count, exactly like
        # optax.scale_by_schedule (first update uses schedule(0))
        lr = (learning_rate(state.count) if callable(learning_rate)
              else learning_rate)
        upd = -lr * upd
        return unravel(upd), FlatAdamState(count=count, m=m, v=v)

    return optax.GradientTransformation(init_fn, update_fn)
