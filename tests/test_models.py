"""Shape/contract tests for the model zoo (tiny configs for CPU speed).

These mirror the reference's ``__main__`` smoke blocks (``mdvit.py:963-995``,
``base.py:702-729``) which are its de-facto unit tests: output shapes, aux
branch shapes, feature shapes, and param accounting.
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


def _rngs():
    return {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}


def _onehot_grouped(d, b_per):
    return jnp.asarray(np.eye(d, dtype=np.float32).repeat(b_per, axis=0))


@pytest.mark.parametrize("adapt,dsn", [("Sup", False), (None, False), ("Sup", True)])
def test_base_shapes(adapt, dsn):
    m = BASE(adapt=adapt, dsn=dsn, num_domains=4, **TINY)
    x = jnp.zeros((8, 32, 32, 3))
    oh = _onehot_grouped(4, 2)
    v = m.init(_rngs(), x, oh, train=False)
    out = m.apply(v, x, oh, train=False)
    assert out["seg"].shape == (8, 32, 32, 1)
    assert out["feat"].shape == (8, 24)
    # feature-extraction mode (out_seg=False)
    out2 = m.apply(v, x, oh, train=False, out_seg=False)
    assert out2["seg"] is None and out2["feat"].shape == (8, 24)


@pytest.mark.parametrize("decoder_name", ["MLPFM", "MLP", "DeepLabV3", "Transformer"])
def test_mdvit_shapes_all_debranches(decoder_name):
    m = MDViT(adapt="Sup", num_domains=4, decoder_name=decoder_name, **TINY)
    x = jnp.zeros((4, 32, 32, 3))
    oh = _onehot_grouped(4, 1)
    v = m.init(_rngs(), x, oh, train=False)
    out = m.apply(v, x, oh, train=False)
    logits, aux = out["seg"]
    assert logits.shape == (4, 32, 32, 1)
    assert aux.shape == (4, 32, 32, 1)


def test_mdvit_train_mode_updates_stats():
    m = MDViT(adapt="Sup", num_domains=4, **TINY)
    x = jnp.ones((4, 32, 32, 3))
    oh = _onehot_grouped(4, 1)
    v = m.init(_rngs(), x, oh, train=False)
    out, upd = m.apply(
        v, x, oh, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    # batch stats must actually change for ones-input (mean != 0)
    old = jax.tree_util.tree_leaves(v["batch_stats"])
    new = jax.tree_util.tree_leaves(upd["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
    )


def test_mdvit_grouped_equals_select_in_eval():
    """For a domain-contiguous batch in eval mode, routing via the grouped
    reshape and via one-hot selection must agree exactly — this pins the
    per-domain debranch dispatch against the reference's explicit
    ``if d=='0': debranch1...`` (``mdvit.py:714-724``)."""
    m = MDViT(adapt="Sup", num_domains=4, **TINY)
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 32, 32, 3))
    oh = _onehot_grouped(4, 2)
    v = m.init(_rngs(), x, oh, train=False)
    out_g = m.apply(v, x, oh, train=False, aux_mode="grouped")
    out_s = m.apply(v, x, oh, train=False, aux_mode="select")
    np.testing.assert_allclose(
        np.asarray(out_g["seg"][1]), np.asarray(out_s["seg"][1]),
        rtol=1e-5, atol=1e-5,
    )


def test_mdvit_debranches_are_distinct():
    """Different domains must route through different debranch params."""
    m = MDViT(adapt="Sup", num_domains=4, **TINY)
    x = jnp.tile(jax.random.normal(jax.random.PRNGKey(4), (1, 32, 32, 3)), (4, 1, 1, 1))
    oh = _onehot_grouped(4, 1)
    v = m.init(_rngs(), x, oh, train=False)
    aux = np.asarray(m.apply(v, x, oh, train=False, aux_mode="select")["seg"][1])
    # same image, 4 different domains → 4 different aux maps
    assert not np.allclose(aux[0], aux[1])
    assert not np.allclose(aux[1], aux[2])


def test_sup_gate_sensitivity():
    """With adapt='Sup' the primary output must depend on the domain label
    (the gate sits inside every attention block)."""
    m = BASE(adapt="Sup", num_domains=4, **TINY)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 32, 3))
    oh_a = jnp.asarray(np.eye(4, dtype=np.float32)[[0, 0]])
    oh_b = jnp.asarray(np.eye(4, dtype=np.float32)[[3, 3]])
    v = m.init(_rngs(), x, oh_a, train=False)
    out_a = np.asarray(m.apply(v, x, oh_a, train=False)["seg"])
    out_b = np.asarray(m.apply(v, x, oh_b, train=False)["seg"])
    assert not np.allclose(out_a, out_b)


def test_dsn_norms_are_domain_sensitive():
    m = BASE(adapt=None, dsn=True, num_domains=4, **TINY)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 32, 32, 3))
    oh_a = jnp.asarray(np.eye(4, dtype=np.float32)[[1, 1]])
    oh_b = jnp.asarray(np.eye(4, dtype=np.float32)[[2, 2]])
    v = m.init(_rngs(), x, oh_a, train=False)
    # perturb domain-2 LN params so domains actually differ at init
    params = jax.tree_util.tree_map(lambda p: p, v["params"])

    def bump(tree):
        for k, sub in tree.items():
            if isinstance(sub, dict):
                bump(sub)
            elif k == "scale" and sub.ndim == 2 and sub.shape[0] == 4:
                tree[k] = sub.at[2].mul(1.5)

    bump(params)
    out_a = np.asarray(m.apply({"params": params, "batch_stats": v["batch_stats"]}, x, oh_a, train=False)["seg"])
    out_b = np.asarray(m.apply({"params": params, "batch_stats": v["batch_stats"]}, x, oh_b, train=False)["seg"])
    assert not np.allclose(out_a, out_b)
