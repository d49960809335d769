"""Data-parallel sharding correctness on the 8-virtual-device CPU mesh.

Pins the claim in ``parallel/mesh.py``: sharding the domain-contiguous
(D·B) batch over the mesh keeps the masked per-domain BN statistics and the
MKD masked double-gradient exact — the sharded train step must produce the
same new params/batch_stats as the unsharded one on identical inputs.
(TPU equivalent of validating the reference's ``torch.nn.DataParallel``,
``multi_train_MDViT.py:73-74``.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mdvit_tpu.models.mdvit import MDViT
from mdvit_tpu.parallel.mesh import batch_sharding, make_mesh
from mdvit_tpu.train.steps import TrainState, make_train_step

TINY = dict(
    img_size=16,
    num_layers=(1, 1, 1, 1),
    embed_dims=(8, 8, 8, 8),
    mlp_ratios=(1, 1, 1, 1),
    num_heads=(8, 8, 8, 8),
)
D, B_PER = 4, 4  # D·B = 16, divisible by the 8-device mesh; B/D=4 per domain


@pytest.fixture(scope="module")
def bundle():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh (conftest env)")
    model = MDViT(adapt="Sup", num_domains=D, **TINY)
    x = jnp.zeros((D * B_PER, 16, 16, 3))
    oh = jnp.repeat(jnp.eye(D, dtype=jnp.float32), B_PER, 0)
    v = jax.jit(
        lambda k: model.init({"params": k, "dropout": k}, x, oh,
                             train=False, aux_mode="grouped")
    )(jax.random.PRNGKey(0))
    # SGD, not AdamW: adam's m/sqrt(v) normalization amplifies the fp32
    # reduction-order noise on true-zero-gradient leaves (conv bias before
    # BN) to ±lr, which would make the sharded-vs-unsharded param comparison
    # meaningless. SGD keeps param deltas proportional to gradient deltas.
    tx = optax.sgd(1e-2)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=v["params"],
        batch_stats=v["batch_stats"], opt_state=tx.init(v["params"]),
        rng=jax.random.PRNGKey(1),
    )
    rng = np.random.RandomState(0)
    images = tuple(
        jnp.asarray(rng.randint(0, 255, (8, 16, 16, 3), np.uint8))
        for _ in range(D)
    )
    masks = tuple(
        jnp.asarray((rng.rand(8, 16, 16) > 0.5).astype(np.uint8))
        for _ in range(D)
    )
    idx = jnp.tile(jnp.arange(B_PER, dtype=jnp.int32), (D, 1))
    return model, tx, state, (images, masks, idx)


def _tree_allclose(a, b, rtol, atol):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for la, lb in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=rtol, atol=atol)


def test_sharded_step_matches_unsharded(bundle):
    """One MKD train step (det_sup, device augment OFF for determinism):
    sharded over the 8-device data mesh ≡ unsharded, to reduction-order
    tolerance. This pins per-domain masked-BN psums and grad psums."""
    model, tx, state, (images, masks, idx) = bundle

    step_plain = make_train_step(model, tx, D, det_sup=True, mkd=True,
                                 device_augment=False, donate=False)
    s1, m1 = step_plain(state, images, masks, idx)

    mesh = make_mesh(8)
    shard = batch_sharding(mesh)
    step_sharded = make_train_step(model, tx, D, det_sup=True, mkd=True,
                                   device_augment=False, donate=False,
                                   data_sharding=shard)
    with mesh:
        s2, m2 = step_sharded(state, images, masks, idx)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["aux_loss"]), float(m2["aux_loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m1["iou_per_domain"]), np.asarray(m2["iou_per_domain"]),
        rtol=1e-5)
    # per-domain BN stats are global sums over the batch axis → psum-exact
    _tree_allclose(s1.batch_stats, s2.batch_stats, rtol=1e-5, atol=1e-6)
    # params after one AdamW update
    _tree_allclose(s1.params, s2.params, rtol=1e-4, atol=1e-6)


def test_sharded_augment_step_runs(bundle):
    """The full production path (device augmentation ON) compiles and runs
    under the mesh; RNG hashing is shard-invariant by construction but the
    warp gather layout must partition."""
    model, tx, state, (images, masks, idx) = bundle
    mesh = make_mesh(8)
    shard = batch_sharding(mesh)
    step = make_train_step(model, tx, D, det_sup=True, mkd=True,
                           device_augment=True, donate=False,
                           data_sharding=shard)
    with mesh:
        s, m = step(state, images, masks, idx)
        jax.block_until_ready(s.params)
    assert int(s.step) == 1
    assert np.isfinite(float(m["loss"]))
