"""Shape/contract tests for the model zoo (tiny configs for CPU speed).

These mirror the reference's ``__main__`` smoke blocks (``mdvit.py:963-995``,
``base.py:702-729``) which are its de-facto unit tests: output shapes, aux
branch shapes, feature shapes, and param accounting. All applies are jitted
and share module-scope inits (eager JAX on this 1-core host is minutes/test).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdvit_tpu.models.base import BASE
from mdvit_tpu.models.mdvit import MDViT

TINY = dict(
    img_size=32,
    num_layers=(1, 1, 1, 1),
    embed_dims=(8, 16, 16, 24),
    mlp_ratios=(2, 2, 2, 2),
    num_heads=(8, 8, 8, 8),
)
RNGS = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}


def _onehot_grouped(d, b_per):
    return jnp.asarray(np.eye(d, dtype=np.float32).repeat(b_per, axis=0))


@pytest.fixture(scope="module")
def mdvit_bundle():
    m = MDViT(adapt="Sup", num_domains=4, **TINY)
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 32, 32, 3))
    oh = _onehot_grouped(4, 2)
    v = jax.jit(
        lambda: m.init(RNGS, x, oh, train=False, aux_mode="grouped")
    )()
    return m, v, x, oh


def test_base_shapes():
    m = BASE(adapt="Sup", num_domains=4, **TINY)
    x = jnp.zeros((4, 32, 32, 3))
    oh = _onehot_grouped(4, 1)
    v = jax.jit(lambda: m.init(RNGS, x, oh, train=False))()
    out = jax.jit(lambda v: m.apply(v, x, oh, train=False))(v)
    assert out["seg"].shape == (4, 32, 32, 1)
    assert out["feat"].shape == (4, 24)
    out2 = jax.jit(lambda v: m.apply(v, x, oh, train=False, out_seg=False))(v)
    assert out2["seg"] is None and out2["feat"].shape == (4, 24)


@pytest.mark.parametrize("decoder_name", ["MLP", "DeepLabV3", "Transformer"])
def test_mdvit_shapes_other_debranches(decoder_name):
    m = MDViT(adapt="Sup", num_domains=4, decoder_name=decoder_name, **TINY)
    x = jnp.zeros((4, 32, 32, 3))
    oh = _onehot_grouped(4, 1)
    v = jax.jit(
        lambda: m.init(RNGS, x, oh, train=False, aux_mode="grouped")
    )()
    out = jax.jit(
        lambda v: m.apply(v, x, oh, train=False, aux_mode="grouped")
    )(v)
    logits, aux = out["seg"]
    assert logits.shape == (4, 32, 32, 1)
    assert aux.shape == (4, 32, 32, 1)


def test_mdvit_mlpfm_shapes_and_train_stats(mdvit_bundle):
    m, v, x, oh = mdvit_bundle
    out, upd = jax.jit(
        lambda v: m.apply(
            v, x, oh, train=True, aux_mode="grouped",
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)},
        )
    )(v)
    logits, aux = out["seg"]
    assert logits.shape == (8, 32, 32, 1)
    assert aux.shape == (8, 32, 32, 1)
    old = jax.tree_util.tree_leaves(v["batch_stats"])
    new = jax.tree_util.tree_leaves(upd["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
    )


def test_mdvit_grouped_equals_select_in_eval(mdvit_bundle):
    """For a domain-contiguous batch in eval mode, grouped-reshape routing and
    one-hot selection must agree — pins the per-domain debranch dispatch
    against the reference's ``if d=='0': debranch1...`` (mdvit.py:714-724)."""
    m, v, x, oh = mdvit_bundle
    out_g = jax.jit(
        lambda v: m.apply(v, x, oh, train=False, aux_mode="grouped"))(v)
    out_s = jax.jit(
        lambda v: m.apply(v, x, oh, train=False, aux_mode="select"))(v)
    np.testing.assert_allclose(
        np.asarray(out_g["seg"][1]), np.asarray(out_s["seg"][1]),
        rtol=1e-5, atol=1e-5,
    )


def test_mdvit_debranches_are_distinct(mdvit_bundle):
    """Same image through 4 domains → 4 different aux maps."""
    m, v, _, _ = mdvit_bundle
    x = jnp.tile(
        jax.random.normal(jax.random.PRNGKey(4), (1, 32, 32, 3)), (4, 1, 1, 1))
    oh = _onehot_grouped(4, 1)
    aux = np.asarray(
        jax.jit(lambda v: m.apply(v, x, oh, train=False,
                                  aux_mode="select"))(v)["seg"][1])
    assert not np.allclose(aux[0], aux[1])
    assert not np.allclose(aux[1], aux[2])


def test_sup_gate_and_dsn_domain_sensitivity():
    """Sup gate: primary output depends on the domain one-hot. DSN: per-domain
    norms route differently once their params differ."""
    m = BASE(adapt="Sup", num_domains=4, **TINY)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 32, 3))
    oh_a = jnp.asarray(np.eye(4, dtype=np.float32)[[0, 0]])
    oh_b = jnp.asarray(np.eye(4, dtype=np.float32)[[3, 3]])
    v = jax.jit(lambda: m.init(RNGS, x, oh_a, train=False))()
    f = jax.jit(lambda v, oh: m.apply(v, x, oh, train=False)["seg"])
    assert not np.allclose(np.asarray(f(v, oh_a)), np.asarray(f(v, oh_b)))

    m2 = BASE(adapt=None, dsn=True, num_domains=4, **TINY)
    v2 = jax.jit(lambda: m2.init(RNGS, x, oh_a, train=False))()
    params = jax.tree_util.tree_map(lambda p: p, v2["params"])

    def bump(tree):
        for k, sub in tree.items():
            if isinstance(sub, dict):
                bump(sub)
            elif k == "scale" and sub.ndim == 2 and sub.shape[0] == 4:
                tree[k] = sub.at[2].mul(1.5)

    bump(params)
    f2 = jax.jit(
        lambda oh: m2.apply(
            {"params": params, "batch_stats": v2["batch_stats"]},
            x, oh, train=False)["seg"])
    oh_c = jnp.asarray(np.eye(4, dtype=np.float32)[[1, 1]])
    oh_d = jnp.asarray(np.eye(4, dtype=np.float32)[[2, 2]])
    assert not np.allclose(np.asarray(f2(oh_c)), np.asarray(f2(oh_d)))
