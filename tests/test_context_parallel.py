"""Context (sequence) parallelism: token-sharded MHSAStage ≡ unsharded.

SURVEY §2.4 "shard the token dimension across a mesh axis". The factorized
attention's only cross-token couplings are the column softmax and the KᵀV
Gram matrix (psum), plus CPE/CRPE row halos (ppermute) — so the sharded
stage must reproduce the unsharded stage exactly (up to fp reduction order)
with the SAME parameter tree.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mdvit_tpu.models.blocks import MHSAStage
from mdvit_tpu.parallel.context import (
    halo_exchange_rows,
    stage_apply_context_parallel,
)

B, H, W, DIM, HEADS = 2, 16, 16, 64, 8


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("ctx",))


def _stages(sup, dsn, axis_name=None, drop=0.0):
    kw = dict(
        dim=DIM, num_layers=2, num_heads=HEADS, mlp_ratio=4.0,
        sup=sup, dsn=dsn, num_domains=4, drop=drop, axis_name=axis_name,
    )
    return MHSAStage(**kw)


def _data(seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(k1, (B, H * W, DIM), jnp.float32)
    dom = jax.nn.one_hot(jnp.array([1, 3]), 4)
    return x, dom, k2


def test_halo_exchange_matches_zero_padding():
    mesh = _mesh(4)
    full = jax.random.normal(jax.random.PRNGKey(7), (B, H, W, 3))
    halo = 2

    def local(xg):
        return halo_exchange_rows(xg, halo, "ctx")

    from jax.sharding import PartitionSpec as P

    out = jax.shard_map(
        local, mesh=mesh, in_specs=P(None, "ctx"),
        out_specs=P(None, "ctx"), check_vma=False,
    )(full)
    # each shard's extended rows == the zero-padded global rows around it
    out = np.asarray(out).reshape(B, 4, H // 4 + 2 * halo, W, 3)
    padded = np.pad(np.asarray(full), ((0, 0), (halo, halo), (0, 0), (0, 0)))
    for s in range(4):
        start = s * (H // 4)
        np.testing.assert_array_equal(
            out[:, s], padded[:, start:start + H // 4 + 2 * halo]
        )


@pytest.mark.parametrize("sup,dsn", [(True, True), (False, False)])
def test_forward_matches_unsharded(sup, dsn):
    x, dom, _ = _data()
    if not sup and not dsn:
        dom = None
    ref = _stages(sup, dsn)
    cp = _stages(sup, dsn, axis_name="ctx")
    params = ref.init(jax.random.PRNGKey(1), x, (H, W), dom, False)
    # identical param tree: one checkpoint serves both layouts (init the CP
    # module inside shard_map, where the mesh axis is bound)
    from jax.sharding import PartitionSpec as P

    def init_local(k, xg, d):
        return cp.init(k, xg.reshape(B, (H // 4) * W, DIM), (H // 4, W),
                       d, False)

    cp_params = jax.shard_map(
        init_local, mesh=_mesh(4),
        in_specs=(P(), P(None, "ctx"), P()), out_specs=P(),
        check_vma=False,
    )(jax.random.PRNGKey(1), x.reshape(B, H, W, DIM), dom)
    assert jax.tree.structure(params) == jax.tree.structure(cp_params)
    assert [l.shape for l in jax.tree.leaves(params)] == [
        l.shape for l in jax.tree.leaves(cp_params)
    ]

    out_ref = ref.apply(params, x, (H, W), dom, False)
    out_cp = stage_apply_context_parallel(
        cp, params, x, (H, W), _mesh(4), "ctx", dom, False
    )
    np.testing.assert_allclose(
        np.asarray(out_cp), np.asarray(out_ref), rtol=2e-5, atol=2e-5
    )


def test_eight_shard_forward():
    # 8-way over a 32-row grid (halo 3 < 4 local rows)
    h = 32
    x = jax.random.normal(jax.random.PRNGKey(3), (B, h * W, DIM), jnp.float32)
    dom = jax.nn.one_hot(jnp.array([0, 2]), 4)
    ref = _stages(True, True)
    cp = _stages(True, True, axis_name="ctx")
    params = ref.init(jax.random.PRNGKey(1), x, (h, W), dom, False)
    out_ref = ref.apply(params, x, (h, W), dom, False)
    out_cp = stage_apply_context_parallel(
        cp, params, x, (h, W), _mesh(8), "ctx", dom, False
    )
    np.testing.assert_allclose(
        np.asarray(out_cp), np.asarray(out_ref), rtol=2e-5, atol=2e-5
    )


def test_gradients_match_unsharded():
    """psum/ppermute transposes: d(loss)/d(params) must agree."""
    x, dom, kg = _data()
    ref = _stages(True, True)
    cp = _stages(True, True, axis_name="ctx")
    params = ref.init(jax.random.PRNGKey(1), x, (H, W), dom, False)
    g = jax.random.normal(kg, (B, H * W, DIM))
    mesh = _mesh(4)

    def loss_ref(p):
        return jnp.sum(ref.apply(p, x, (H, W), dom, False) * g)

    def loss_cp(p):
        return jnp.sum(
            stage_apply_context_parallel(cp, p, x, (H, W), mesh, "ctx",
                                         dom, False) * g
        )

    g_ref = jax.grad(loss_ref)(params)
    g_cp = jax.grad(loss_cp)(params)
    flat_ref, flat_cp = jax.tree.leaves(g_ref), jax.tree.leaves(g_cp)
    for a, b in zip(flat_ref, flat_cp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-5
        )


def test_train_mode_runs_and_dropout_decorrelated():
    """Train mode runs under CP, and per-shard hash-dropout masks differ
    (the axis_index seed fold) — without it every shard would re-hash the
    same local element counters with the same seed and produce IDENTICAL
    masks on identical inputs."""
    x, dom, _ = _data()
    cp = _stages(True, True, axis_name="ctx", drop=0.5)
    ref = _stages(True, True, drop=0.5)
    params = ref.init(jax.random.PRNGKey(1), x, (H, W), dom, False)
    out = stage_apply_context_parallel(
        cp, params, x, (H, W), _mesh(4), "ctx", dom, True,
        rngs={"dropout": jax.random.PRNGKey(9)},
    )
    assert np.isfinite(np.asarray(out)).all()

    # Direct decorrelation check: identical per-shard inputs + same rng must
    # still produce different masks on different shards.
    from jax.sharding import PartitionSpec as P

    from mdvit_tpu.ops.layers import FastDropout

    drop = FastDropout(0.5, axis_name="ctx")
    same_rows = jnp.ones((B, 4 * (H // 4) * W, DIM))

    def local(xs, key):
        return drop.apply({}, xs, True, rngs={"dropout": key})

    masked = jax.shard_map(
        local, mesh=_mesh(4), in_specs=(P(None, "ctx"), P()),
        out_specs=P(None, "ctx"), check_vma=False,
    )(same_rows, jax.random.PRNGKey(5))
    shards = np.asarray(masked).reshape(B, 4, (H // 4) * W, DIM)
    assert not np.array_equal(shards[:, 0] == 0, shards[:, 1] == 0)
