"""Train-step semantics: the MKD masked double-gradient, loss accounting,
and state updates (tiny model, CPU).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from mdvit_tpu.models.mdvit import MDViT
from mdvit_tpu.train.steps import (
    TrainState,
    make_train_step,
    path_contains,
    _per_domain_losses,
)

TINY = dict(
    img_size=16,
    num_layers=(1, 1, 1, 1),
    embed_dims=(8, 8, 8, 8),
    mlp_ratios=(1, 1, 1, 1),
    num_heads=(8, 8, 8, 8),
)
D, B = 4, 1


def _setup(det_sup=True, alpha=0.5):
    model = MDViT(adapt="Sup", num_domains=D, **TINY)
    x = jnp.zeros((D * B, 16, 16, 3))
    oh = jnp.repeat(jnp.eye(D, dtype=jnp.float32), B, 0)
    v = jax.jit(
        lambda k: model.init({"params": k, "dropout": k}, x, oh,
                             train=False, aux_mode="grouped")
    )(jax.random.PRNGKey(0))
    tx = optax.sgd(1e-2)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=v["params"],
        batch_stats=v["batch_stats"], opt_state=tx.init(v["params"]),
        rng=jax.random.PRNGKey(1),
    )
    rng = np.random.RandomState(0)
    images = tuple(
        jnp.asarray(rng.randint(0, 255, (4, 16, 16, 3), np.uint8))
        for _ in range(D)
    )
    masks = tuple(
        jnp.asarray((rng.rand(4, 16, 16) > 0.5).astype(np.uint8))
        for _ in range(D)
    )
    idx = jnp.zeros((D, B), jnp.int32)
    step = make_train_step(model, tx, D, alpha=alpha, det_sup=det_sup,
                           mkd=True, device_augment=False, donate=False)
    return model, state, step, (images, masks, idx)


def test_train_step_runs_and_updates():
    _, state, step, (images, masks, idx) = _setup()
    new_state, metrics = step(state, images, masks, idx)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["aux_loss"]))
    assert np.isfinite(float(metrics["kt_loss"]))
    assert metrics["dice_per_domain"].shape == (D,)
    # params actually moved
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params,
        new_state.params,
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_remat_step_matches_plain_step():
    """tpu.remat wraps the forward in jax.checkpoint — identical math, only
    the backward's activation schedule changes. Params/stats/metrics after
    one step must match the plain step to float tolerance."""
    model, state, step, (images, masks, idx) = _setup()
    from mdvit_tpu.models.mdvit import MDViT  # noqa: F811 (clarity)
    import optax as _optax

    tx = _optax.sgd(1e-2)
    step_r = make_train_step(model, tx, D, alpha=0.5, det_sup=True,
                             mkd=True, device_augment=False, donate=False,
                             remat=True)
    s1, m1 = step(state, images, masks, idx)
    s2, m2 = step_r(state, images, masks, idx)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(s2.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_det_sup_blocks_aux_grads_into_domain_layer():
    """With det_sup, domain_layer grads must equal grads of uni loss only:
    compare updates between det_sup runs at alpha=0 (uni = seg only) where a
    pure-aux objective would otherwise move domain_layer."""
    model, state, step_det, batch = _setup(det_sup=True)
    images, masks, idx = batch

    # Build both step functions from the same initial state
    _, _, step_nodet, _ = _setup(det_sup=False)
    s_det, _ = step_det(state, images, masks, idx)
    s_nodet, _ = step_nodet(state, images, masks, idx)

    def domain_layer_delta(new):
        out = []

        def walk(tree, old, path=""):
            for k in tree:
                if isinstance(tree[k], dict):
                    walk(tree[k], old[k], path + "/" + k)
                elif "domain_layer" in path + "/" + k:
                    out.append(float(jnp.max(jnp.abs(tree[k] - old[k]))))

        walk(new.params, state.params)
        return out

    d_det = domain_layer_delta(s_det)
    d_nodet = domain_layer_delta(s_nodet)
    assert len(d_det) > 0, "model must contain domain_layer params"
    # both move (uni loss still reaches domain_layer) but differently —
    # the aux-loss contribution is masked out under det_sup
    assert not np.allclose(d_det, d_nodet)


def test_det_sup_exact_semantics():
    """Exact masked-double-gradient check with a third vjp pull: under
    det_sup, grad[domain_layer] ≡ grad(uni)[domain_layer] exactly, and for
    every other param grad ≡ grad(uni) + grad(aux) (reference staged backward,
    ``multi_train_MDViT.py:195-211``)."""
    import jax.tree_util as jtu

    model, state, _, (images, masks, idx) = _setup()
    from mdvit_tpu.data.augment import eval_transform
    from mdvit_tpu.data.loader import gather_batch

    x_raw, m_raw, onehot = gather_batch(images, masks, idx)
    x, y = eval_transform(x_raw, m_raw)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            x, onehot, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)}, aux_mode="grouped",
        )
        logits, aux_logits = out["seg"]
        seg_d, aux_d, kt_d, _, _ = _per_domain_losses(logits, aux_logits, y, D)
        uni = 0.5 * jnp.sum(kt_d) + 0.5 * jnp.sum(seg_d)
        return jnp.sum(aux_d), uni

    @jax.jit
    def pulls(params):
        _, vjp = jax.vjp(loss_fn, params)
        one = jnp.ones((), jnp.float32)
        zero = jnp.zeros((), jnp.float32)
        (g_all,) = vjp((one, one))
        (g_uni,) = vjp((zero, one))
        (g_aux,) = vjp((one, zero))
        return g_all, g_uni, g_aux

    g_all, g_uni, g_aux = pulls(state.params)
    masked = jtu.tree_map_with_path(
        lambda p, ga, gu: gu if path_contains(p, "domain_layer") else ga,
        g_all, g_uni,
    )

    flat_m = jtu.tree_flatten_with_path(masked)[0]
    flat_u = jtu.tree_leaves(g_uni)
    flat_a = jtu.tree_leaves(g_aux)
    saw_domain = saw_nonzero_aux_into_domain = False
    for (path, m_leaf), u_leaf, a_leaf in zip(flat_m, flat_u, flat_a):
        if path_contains(path, "domain_layer"):
            saw_domain = True
            np.testing.assert_array_equal(np.asarray(m_leaf),
                                          np.asarray(u_leaf))
            if float(jnp.max(jnp.abs(a_leaf))) > 0:
                saw_nonzero_aux_into_domain = True
        else:
            # one (1,1)-cotangent pull vs the sum of two single pulls: same
            # linear combination, fp32 reduction-order roundoff only. atol
            # floor 1e-5 covers true-zero-gradient leaves (a conv bias
            # followed by BatchNorm has exactly-zero gradient; its computed
            # value is pure cancellation noise ~1e-6).
            np.testing.assert_allclose(
                np.asarray(m_leaf), np.asarray(u_leaf + a_leaf),
                rtol=5e-4, atol=1e-5)
    assert saw_domain, "model must contain domain_layer params"
    # the mask must be masking something real: the aux loss DOES produce
    # gradient into domain_layer (through the shared encoder's Sup gates)
    assert saw_nonzero_aux_into_domain


def test_per_domain_losses_match_sequential_reference_accounting(rng):
    """Summed per-domain losses over the stacked batch must equal computing
    each domain's loss on its own minibatch and summing (the reference's
    sequential accumulation, multi_train_MDViT.py:151-194)."""
    from mdvit_tpu.train.losses import bce_with_logits, dice_loss

    d, b, s = 3, 2, 8
    logits = jnp.asarray(rng.randn(d * b, s, s, 1).astype(np.float32))
    aux = jnp.asarray(rng.randn(d * b, s, s, 1).astype(np.float32))
    y = jnp.asarray((rng.rand(d * b, s, s, 1) > 0.5).astype(np.float32))

    seg_d, aux_d, kt_d, _, _ = _per_domain_losses(logits, aux, y, d)

    want_seg = want_aux = want_kt = 0.0
    for i in range(d):
        sl = slice(i * b, (i + 1) * b)
        p = jax.nn.sigmoid(logits[sl])
        ap = jax.nn.sigmoid(aux[sl])
        want_seg += float(bce_with_logits(logits[sl], y[sl]) + dice_loss(p, y[sl]))
        want_aux += float(bce_with_logits(aux[sl], y[sl]) + dice_loss(ap, y[sl]))
        want_kt += float(dice_loss(ap, p))

    np.testing.assert_allclose(float(jnp.sum(seg_d)), want_seg, rtol=1e-5)
    np.testing.assert_allclose(float(jnp.sum(aux_d)), want_aux, rtol=1e-5)
    np.testing.assert_allclose(float(jnp.sum(kt_d)), want_kt, rtol=1e-5)


def test_path_contains():
    import jax.tree_util as jtu

    tree = {"a": {"domain_layer_fc1": {"kernel": 1}}, "b": {"kernel": 2}}
    flat = jtu.tree_flatten_with_path(tree)[0]
    hits = [path_contains(p, "domain_layer") for p, _ in flat]
    assert hits == [True, False]


def test_eval_single_debranch_matches_select():
    """aux_mode='features' + unstacked debranch applied with domain-sliced
    variables ≡ the broadcast 'select' path on a single-domain batch — pins
    the eval step's reference-faithful one-debranch dispatch
    (``mdvit.py:714-724``)."""
    model = MDViT(adapt="Sup", num_domains=D, **TINY)
    x = jnp.zeros((D * B, 16, 16, 3))
    oh0 = jnp.repeat(jnp.eye(D, dtype=jnp.float32), B, 0)
    v = jax.jit(
        lambda k: model.init({"params": k, "dropout": k}, x, oh0,
                             train=False, aux_mode="grouped")
    )(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    xb = jnp.asarray(rng.rand(3, 16, 16, 3).astype(np.float32))
    for di in range(D):
        oh = jnp.zeros((3, D)).at[:, di].set(1.0)
        sel = jax.jit(
            lambda v, xb, oh: model.apply(v, xb, oh, train=False,
                                          aux_mode="select")
        )(v, xb, oh)
        feats = jax.jit(
            lambda v, xb, oh: model.apply(v, xb, oh, train=False,
                                          aux_mode="features")
        )(v, xb, oh)
        sub = model.debranch_module()
        aux_vars = {
            "params": jax.tree_util.tree_map(
                lambda a: a[di], v["params"]["debranch"]),
            "batch_stats": jax.tree_util.tree_map(
                lambda a: a[di], v["batch_stats"].get("debranch", {})),
        }
        aux = jax.jit(
            lambda av, f: sub.apply(av, f, None, False)
        )(aux_vars, feats["aux_features"])
        np.testing.assert_allclose(
            np.asarray(aux), np.asarray(sel["seg"][1]), rtol=2e-5, atol=2e-5)
