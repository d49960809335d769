"""flat_adamw claims bit-identical math to optax.adamw — pin it.

Covers constant lr, a scheduled lr (pre-increment evaluation: first update
uses schedule(0), StepLR transitions land on the same step as optax), and
weight decay over a small mixed-shape pytree.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from mdvit_tpu.train.flat_optim import flat_adamw


def _tree(seed=0):
    rs = np.random.RandomState(seed)
    return {
        "a": {"kernel": jnp.asarray(rs.randn(3, 5), jnp.float32),
              "bias": jnp.asarray(rs.randn(5), jnp.float32)},
        "b": jnp.asarray(rs.randn(7), jnp.float32),
    }


def _run(tx, params, grads_seq):
    state = tx.init(params)
    for g in grads_seq:
        upd, state = tx.update(g, state, params)
        params = optax.apply_updates(params, upd)
    return params


def _assert_close(p1, p2, tol=1e-6):
    for l1, l2 in zip(jax.tree_util.tree_leaves(p1),
                      jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=tol,
                                   rtol=0)


def test_flat_adamw_matches_optax_constant_lr():
    params = _tree()
    grads = [_tree(seed=i + 1) for i in range(5)]
    ours = _run(flat_adamw(1e-3, weight_decay=0.05), params, grads)
    ref = _run(optax.adamw(1e-3, weight_decay=0.05), params, grads)
    _assert_close(ours, ref)


def test_flat_adamw_matches_optax_scheduled_lr():
    # steep staircase so any off-by-one in schedule evaluation shows up as a
    # 10x lr difference on the transition step
    sched = optax.exponential_decay(
        init_value=1e-2, transition_steps=3, decay_rate=0.1, staircase=True)
    params = _tree()
    grads = [_tree(seed=i + 1) for i in range(7)]
    ours = _run(flat_adamw(sched, weight_decay=0.01), params, grads)
    ref = _run(optax.adamw(sched, weight_decay=0.01), params, grads)
    _assert_close(ours, ref)


def test_flat_adamw_no_weight_decay_is_adam():
    params = _tree()
    grads = [_tree(seed=i + 1) for i in range(3)]
    ours = _run(flat_adamw(3e-4), params, grads)
    ref = _run(optax.adam(3e-4), params, grads)
    _assert_close(ours, ref)
