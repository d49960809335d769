"""Full-model MDViT_DSN coverage (reference ``mdvit.py:735-960``): the
flagship-DSN composition — per-domain norms through stem/patch-embeds/
blocks/bridge/decoder PLUS the vmap-stacked debranches PLUS the masked MKD
double-gradient — constructed, stepped, and invariance-tested.

DSN at the op level is covered by ``tests/test_ops_parity.py``
(DomainBatchNorm exact per-domain stats) and ``BASE(dsn=True)``
(``tests/test_models.py``); these tests close the remaining hole: the
*composition* as the registry entry ``MDViT_DSN`` builds it.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mdvit_tpu.models.registry import get_model
from mdvit_tpu.train.steps import TrainState, make_train_step

TINY = dict(
    img_size=32,
    num_layers=(1, 1, 1, 1),
    embed_dims=(8, 16, 16, 24),
    mlp_ratios=(2, 2, 2, 2),
    num_heads=(8, 8, 8, 8),
)
D, B = 4, 2
RNGS = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}


def _onehot_grouped(d, b_per):
    return jnp.asarray(np.eye(d, dtype=np.float32).repeat(b_per, axis=0))


@pytest.fixture(scope="module")
def dsn_bundle():
    m = get_model("MDViT_DSN", num_domains=D, **TINY)
    assert m.dsn and m.adapt == "Sup"  # the reference DSN keeps Sup adapters
    x = jax.random.normal(jax.random.PRNGKey(3), (D * B, 32, 32, 3))
    oh = _onehot_grouped(D, B)
    v = jax.jit(
        lambda: m.init(RNGS, x, oh, train=False, aux_mode="grouped")
    )()
    return m, v, x, oh


def _per_domain_affine_leaves(params):
    """All (D, C) per-domain norm affines OUTSIDE the debranch stack: the DSN
    wiring through stem/patch-embeds/blocks/bridge/decoder."""
    leaves = []

    def walk(tree, path):
        for k, sub in tree.items():
            if isinstance(sub, dict):
                walk(sub, path + (k,))
            elif (
                k in ("scale", "bias")
                and getattr(sub, "ndim", 0) == 2
                and sub.shape[0] == D
                and "debranch" not in path
            ):
                leaves.append((path + (k,), sub))

    walk(params, ())
    return leaves


def test_dsn_wiring_is_pervasive(dsn_bundle):
    """DSN must thread per-domain norms through the whole tree, not just one
    layer, and keep per-domain running batch stats (stats_per_domain)."""
    m, v, _, _ = dsn_bundle
    affines = _per_domain_affine_leaves(v["params"])
    assert len(affines) >= 20, (
        f"only {len(affines)} per-domain norm affines found — DSN not wired "
        "through the encoder/decoder")
    # per-domain running stats exist outside the debranch
    stats = []

    def walk(tree, path):
        for k, sub in tree.items():
            if isinstance(sub, dict):
                walk(sub, path + (k,))
            elif (
                k in ("mean", "var")
                and getattr(sub, "ndim", 0) == 2
                and sub.shape[0] == D
                and "debranch" not in path
            ):
                stats.append(path + (k,))

    walk(v["batch_stats"], ())
    assert len(stats) >= 10


def test_dsn_full_train_step(dsn_bundle):
    """The registry MDViT_DSN through the PRODUCTION train step (MKD masked
    double-gradient, device augment, optimizer update)."""
    m, v, _, _ = dsn_bundle
    tx = optax.sgd(1e-2)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=v["params"],
        batch_stats=v["batch_stats"], opt_state=tx.init(v["params"]),
        rng=jax.random.PRNGKey(1),
    )
    rng = np.random.RandomState(0)
    images = tuple(
        jnp.asarray(rng.randint(0, 255, (4, 32, 32, 3), np.uint8))
        for _ in range(D)
    )
    masks = tuple(
        jnp.asarray((rng.rand(4, 32, 32) > 0.5).astype(np.uint8))
        for _ in range(D)
    )
    idx = jnp.asarray(rng.randint(0, 4, (D, B)), jnp.int32)
    step = make_train_step(m, tx, D, alpha=0.5, det_sup=True, mkd=True,
                           device_augment=True, donate=False)
    new_state, metrics = step(state, images, masks, idx)
    assert int(new_state.step) == 1
    for key in ("loss", "aux_loss", "kt_loss"):
        assert np.isfinite(float(metrics[key]))
    # params moved and per-domain running stats updated
    moved = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        state.params, new_state.params)
    assert any(jax.tree_util.tree_leaves(moved))
    old_stats = jax.tree_util.tree_leaves(state.batch_stats)
    new_stats = jax.tree_util.tree_leaves(new_state.batch_stats)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(old_stats, new_stats))


def test_dsn_grouped_equals_select_in_eval(dsn_bundle):
    """Grouped-reshape debranch routing ≡ one-hot selection for a
    domain-contiguous eval batch — with per-domain norms active underneath
    (reference dispatch ``mdvit.py:939-949``)."""
    m, v, x, oh = dsn_bundle
    out_g = jax.jit(
        lambda v: m.apply(v, x, oh, train=False, aux_mode="grouped"))(v)
    out_s = jax.jit(
        lambda v: m.apply(v, x, oh, train=False, aux_mode="select"))(v)
    np.testing.assert_allclose(
        np.asarray(out_g["seg"][0]), np.asarray(out_s["seg"][0]),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_g["seg"][1]), np.asarray(out_s["seg"][1]),
        rtol=1e-5, atol=1e-5)


def test_dsn_per_domain_gradient_isolation(dsn_bundle):
    """A loss restricted to domain k's samples must move ONLY domain k's
    slices of every per-domain norm affine (and only debranch slice k): the
    per-sample one-hot routing makes each domain's norm slice depend on that
    domain's samples alone, exactly like the reference's ``ModuleList[d]``
    branching."""
    m, v, x, oh = dsn_bundle
    k = 2

    def loss(params):
        out, _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, oh, train=True, aux_mode="grouped", mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(7)},
        )
        logits, aux = out["seg"]
        lg = logits.reshape((D, B) + logits.shape[1:])
        ag = aux.reshape((D, B) + aux.shape[1:])
        return jnp.sum(lg[k] ** 2) + jnp.sum(ag[k] ** 2)

    grads = jax.jit(jax.grad(loss))(v["params"])
    affines = _per_domain_affine_leaves(grads)
    assert len(affines) >= 20
    touched = 0
    for path, g in affines:
        g = np.asarray(g)
        others = np.delete(g, k, axis=0)
        assert np.allclose(others, 0.0, atol=1e-9), (
            f"{'/'.join(path)}: gradient leaked into other domains' slices")
        touched += int(not np.allclose(g[k], 0.0))
    # most domain-k slices carry signal (a few may sit behind dead paths)
    assert touched >= len(affines) // 2
    # debranch isolation: only slice k moves
    for g in jax.tree_util.tree_leaves(grads["debranch"]):
        g = np.asarray(g)
        assert np.allclose(np.delete(g, k, axis=0), 0.0, atol=1e-9)
