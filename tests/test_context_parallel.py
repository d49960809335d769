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


# ------------------------------------------------------- end-to-end (GSPMD)

def _tiny_base(drop=0.0):
    from mdvit_tpu.models.base import BASE

    return BASE(
        img_size=64, num_layers=(1, 1, 1, 1), embed_dims=(8, 16, 16, 24),
        mlp_ratios=(2, 2, 2, 2), num_heads=(8, 8, 8, 8), adapt="Sup",
        num_domains=4, drop_rate=drop, drop_path_rate=drop,
    )


def test_e2e_forward_matches_unsharded():
    """Full BASE forward (stem → strided patch embeds → 4 MHSA stages →
    bridge → 4 decoder blocks → head) with image rows sharded over a 2-way
    ctx mesh via GSPMD must equal the single-device forward. Covers the
    spatial-conv halos, token reshapes, BN moments, and bilinear upsampling
    that the stage-level shard_map path does not. 2-way because the tiny
    64² model's deepest grid is 2×2 — the min-grid guard (parallel/
    context.py) rejects more shards than rows, where XLA SPMD's backward
    is measurably wrong."""
    from mdvit_tpu.parallel.context import model_apply_context_parallel

    model = _tiny_base()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3), jnp.float32)
    dom = jax.nn.one_hot(jnp.array([1, 3]), 4)
    variables = jax.jit(
        lambda k: model.init({"params": k, "dropout": k}, x, dom,
                             train=False))(jax.random.PRNGKey(1))
    ref = jax.jit(lambda v, xx, oh: model.apply(v, xx, oh, train=False))(
        variables, x, dom)
    cp = model_apply_context_parallel(model, variables, x, dom, _mesh(2))
    # GSPMD reorders the psum/BN-moment reductions across shards; at these
    # logit scales (|seg| up to ~10) fp32 reduction-order noise is ~1e-4.
    np.testing.assert_allclose(np.asarray(cp["seg"]),
                               np.asarray(ref["seg"]),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(cp["feat"]),
                               np.asarray(ref["feat"]),
                               rtol=5e-4, atol=5e-4)


def test_e2e_train_step_matches_unsharded():
    """One full BASE train step (BCE+dice, AdamW, BN stat update) on the
    2-way ctx mesh vs the identical step on a 1-device mesh.

    Loss, gradients, and BN stats must agree to fp32 reduction-order
    noise (GSPMD grads ≡ single-device grads). Updated PARAMS are only
    bounded, not matched elementwise: Adam's first step is
    lr·m̂/(√v̂+ε) ≈ ±lr for ANY nonzero gradient, so where a true grad
    element is ~0 the reduction noise picks the sign and the update
    flips by the full 2·lr — that is optimizer saturation, not a
    sharding bug."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mdvit_tpu.parallel.context import make_context_parallel_train_step
    from mdvit_tpu.train.losses import seg_loss_from_logits

    model = _tiny_base()
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3), jnp.float32)
    y = (jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 1)) > 0.5
         ).astype(jnp.float32)
    dom = jax.nn.one_hot(jnp.array([0, 2]), 4)
    variables = jax.jit(
        lambda k: model.init({"params": k, "dropout": k}, x, dom,
                             train=False))(jax.random.PRNGKey(1))
    tx = optax.adamw(1e-4, weight_decay=0.05)
    state0 = (variables["params"], variables["batch_stats"],
              tx.init(variables["params"]))
    rng = jax.random.PRNGKey(9)

    def loss_fn(p, bs, xx, yy, oh):
        out, _ = model.apply(
            {"params": p, "batch_stats": bs}, xx, oh, train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        return seg_loss_from_logits(out["seg"], yy)

    def grads_on(mesh):
        rep = NamedSharding(mesh, P())
        rows = NamedSharding(mesh, P(None, "ctx"))
        g = jax.jit(jax.grad(loss_fn),
                    in_shardings=(rep, rep, rows, rows, rep),
                    out_shardings=rep)
        return g(state0[0], state0[1], x, y, dom)

    g1 = grads_on(_mesh(1))
    g4 = grads_on(_mesh(2))
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g4)):
        a, b = np.asarray(a), np.asarray(b)
        # fp32 reduction-order noise through the 16-block backward chain
        # reaches ~2e-4 of each leaf's scale; the 1e-6 floor covers leaves
        # whose TRUE grad is ~0 (a conv bias feeding a BN) and which hold
        # pure noise. Semantic failures (the degenerate-shard miscompile
        # this test exists to catch) are ≥3x on O(0.1..1)-scale leaves.
        np.testing.assert_allclose(
            b, a, rtol=1e-3, atol=max(3e-4 * np.abs(a).max(), 1e-6))

    step1 = make_context_parallel_train_step(model, tx, _mesh(1))
    step4 = make_context_parallel_train_step(model, tx, _mesh(2))
    (p1, s1, _), loss1 = step1(state0, x, y, dom, rng)
    (p4, s4, _), loss4 = step4(state0, x, y, dom, rng)

    # sharded BCE/dice reductions + GSPMD grad psums reorder fp32 sums
    np.testing.assert_allclose(float(loss4), float(loss1), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p4)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2.05e-4)  # ≤ 2·lr (see docstring)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s4)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_e2e_train_mode_dropout_exact_under_gspmd():
    """With drop_rate>0 the GSPMD path still matches the unsharded program
    bit-for-bit in mask placement: the hash-RNG draws are traced on GLOBAL
    shapes, so sharding cannot change them (contrast with the shard_map
    path, which decorrelates masks per shard by design)."""
    from mdvit_tpu.parallel.context import model_apply_context_parallel

    model = _tiny_base(drop=0.3)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 64, 64, 3), jnp.float32)
    dom = jax.nn.one_hot(jnp.array([1, 2]), 4)
    variables = jax.jit(
        lambda k: model.init({"params": k, "dropout": k}, x, dom,
                             train=False))(jax.random.PRNGKey(1))
    rngs = {"dropout": jax.random.PRNGKey(7)}
    ref, _ = jax.jit(lambda v, xx, oh: model.apply(
        v, xx, oh, train=True, rngs=rngs,
        mutable=["batch_stats"]))(variables, x, dom)
    cp, _ = model_apply_context_parallel(model, variables, x, dom, _mesh(2),
                                         train=True, rngs=rngs,
                                         mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(cp["seg"]), np.asarray(ref["seg"]),
                               rtol=5e-4, atol=5e-4)


def test_e2e_min_grid_guard():
    """More ctx shards than deepest-grid rows must be rejected up front:
    XLA SPMD's backward inflates grads ~3-4x when some shards of a dim are
    pure padding (found by the gradient-parity test at 64²/4-way; verified
    clean at min-grid >= n_shards)."""
    import pytest

    from mdvit_tpu.parallel.context import model_apply_context_parallel

    model = _tiny_base()
    x = jnp.zeros((1, 64, 64, 3))
    dom = jax.nn.one_hot(jnp.array([0]), 4)
    with pytest.raises(ValueError, match="ctx"):
        model_apply_context_parallel(model, {}, x, dom, _mesh(4))


def test_e2e_dp_cp_composed_mesh():
    """DP×CP in one program: a (data=2, ctx=2) mesh shards the batch AND
    the image rows; loss and BN stats must match the unsharded step (GSPMD
    composes the grad all-reduce over `data` with the halo/psum collectives
    over `ctx`)."""
    import optax

    from mdvit_tpu.parallel.context import (
        make_context_parallel_train_step,
        make_dp_context_mesh,
    )

    model = _tiny_base()
    # B=4: the composed-mesh guard requires >= 2 samples-or-rows per shard
    # at the deepest grid (the 1x1-tile case is an XLA SPMD miscompile —
    # BN stats ~2x off, loss shifted ~1e-4; see parallel/context.py)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 64, 64, 3), jnp.float32)
    y = (jax.random.uniform(jax.random.PRNGKey(3), (4, 64, 64, 1)) > 0.5
         ).astype(jnp.float32)
    dom = jax.nn.one_hot(jnp.array([0, 2, 1, 3]), 4)
    variables = jax.jit(
        lambda k: model.init({"params": k, "dropout": k}, x, dom,
                             train=False))(jax.random.PRNGKey(1))
    tx = optax.adamw(1e-4, weight_decay=0.05)
    state0 = (variables["params"], variables["batch_stats"],
              tx.init(variables["params"]))
    rng = jax.random.PRNGKey(9)

    step1 = make_context_parallel_train_step(model, tx, _mesh(1))
    step22 = make_context_parallel_train_step(
        model, tx, make_dp_context_mesh(2, 2))
    (_, s1, _), loss1 = step1(state0, x, y, dom, rng)
    (_, s22, _), loss22 = step22(state0, x, y, dom, rng)

    np.testing.assert_allclose(float(loss22), float(loss1), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s22)):
        # var stats are E[x2]-m2 differences: absolute noise ~1e-4 when the
        # variance itself is small; the miscompile this guards is ~2x
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)

    # the 1x1-tile case must be rejected, not silently miscompiled
    import pytest

    xb2 = x[:2]
    with pytest.raises(ValueError, match="DP x CP"):
        step22(state0, xb2, y[:2], dom[:2], rng)
