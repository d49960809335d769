"""``Sup_label='DC'`` 15-domain mode (``multi_train_BASE.py:442-443``): the
Sup gate conditions on the 15 diagnosis classes instead of the 4 datasets.
The reference builds the model with K=15 from its DC count list; everything
domain-sized (gate MLP input, one-hot width, per-domain BN/LN stacks) must
scale with it. One real train step of BASE+Sup at D=15 pins the claim.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from mdvit_tpu.models.base import BASE
from mdvit_tpu.train.steps import TrainState, make_train_step

D = 15
TINY = dict(
    img_size=16,
    num_layers=(1, 1, 1, 1),
    embed_dims=(8, 8, 8, 8),
    mlp_ratios=(1, 1, 1, 1),
    num_heads=(8, 8, 8, 8),
)


def test_base_sup_15_domains_one_step():
    model = BASE(adapt="Sup", num_domains=D, **TINY)
    b_per = 1
    x = jnp.zeros((D * b_per, 16, 16, 3))
    oh = jnp.repeat(jnp.eye(D, dtype=jnp.float32), b_per, 0)
    v = jax.jit(
        lambda k: model.init({"params": k, "dropout": k}, x, oh, train=False)
    )(jax.random.PRNGKey(0))

    # every Sup gate MLP takes the 15-wide one-hot (DC count list length,
    # multi_train_BASE.py:443)
    gates = [
        (path, leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(v["params"])
        if any("domain_layer_fc1" in str(getattr(p, "key", p)) for p in path)
        and path[-1].key == "kernel"
    ]
    assert gates, "no Sup gate params found"
    for path, leaf in gates:
        assert leaf.shape[0] == D, (path, leaf.shape)

    tx = optax.sgd(1e-2)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=v["params"],
        batch_stats=v["batch_stats"], opt_state=tx.init(v["params"]),
        rng=jax.random.PRNGKey(1),
    )
    rs = np.random.RandomState(0)
    images = tuple(
        jnp.asarray(rs.randint(0, 255, (2, 16, 16, 3), np.uint8))
        for _ in range(D)
    )
    masks = tuple(
        jnp.asarray((rs.rand(2, 16, 16) > 0.5).astype(np.uint8))
        for _ in range(D)
    )
    idx = jnp.zeros((D, b_per), jnp.int32)
    step = make_train_step(model, tx, D, mkd=False, device_augment=False,
                           donate=False)
    s, m = step(state, images, masks, idx)
    assert int(s.step) == 1
    assert np.isfinite(float(m["loss"]))
    assert m["loss_per_domain"].shape == (D,)
    # the gate params moved: the 15-domain conditioning is live in the graph
    # (exact inequality — gate gradients are small at init, so a tolerance-
    # based allclose would miss genuine sub-1e-8 SGD updates)
    changed = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(s.params):
        if any("domain_layer" in str(getattr(p, "key", p)) for p in path):
            before = v["params"]
            for p in path:
                before = before[p.key]
            changed += int(np.any(np.asarray(leaf) != np.asarray(before)))
    assert changed > 0, "no domain_layer parameter moved in the train step"
