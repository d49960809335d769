"""Context (sequence) parallelism for the token-space transformer stages.

SURVEY §2.4: shard the token dimension across a mesh axis. The MDViT/MPViT/
CoaT substrate is unusually CP-friendly because its attention is *factorized*
(``mpvit.py:321-373``): the only cross-token couplings in an ``MHSAStage`` are

* the column softmax over tokens inside ``FactorAtt``  → ``pmax`` + ``psum``
  of ``(B, 1, C)`` row stats,
* the ``KᵀV`` contraction over tokens                   → one ``psum`` of the
  tiny ``(B, C, C)`` head-masked Gram matrix,
* the depthwise convs of CPE/CRPE on the ``(H, W)`` grid → a ``ppermute``
  halo exchange of ``k//2`` rows with the two ring neighbours.

Everything else (LayerNorm, QKV/proj/MLP matmuls, the Sup domain gate) is
token-local, so a stage sharded over rows of the token grid costs
O(B·C² + halo·W·C) bytes of ICI per block instead of the O(B·N·C)
all-gather a quadratic-attention model would need.

The same flax modules run both ways: ``axis_name=None`` (default) is the
single-shard program, ``axis_name='ctx'`` inserts the collectives. Param
trees are identical, so one checkpoint serves both. Dropout masks are
decorrelated across shards by folding ``axis_index`` into the hash-RNG seed
(ops/layers.py:FastDropout); DropPath deliberately keeps one per-sample mask
replicated across shards (a sample is either kept or dropped *everywhere*).

The reference has no equivalent (its DataParallel replicates the full
sequence per GPU); this is a TPU-native capability for high-resolution
inputs whose token grids exceed one chip's HBM.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def axis_size(axis_name: str) -> int:
    """Static size of a shard_map mesh axis (psum of 1 is constant-folded)."""
    return jax.lax.psum(1, axis_name)


def halo_exchange_rows(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Exchange row halos along a row-sharded image grid.

    ``x`` is this shard's ``(B, H_loc, W, C)`` rows of a global ``(B, H, W, C)``
    grid laid out contiguously over ``axis_name``. Returns
    ``(B, H_loc + 2·halo, W, C)`` where the first/last ``halo`` rows come from
    the ring neighbours via ``ppermute``. Devices at the global top/bottom
    receive zeros (ppermute's semantics for destinations with no source),
    which reproduces exactly the zero padding a full-grid conv would use.
    """
    if halo == 0:
        return x
    if x.shape[1] < halo:
        raise ValueError(
            f"context-parallel halo {halo} exceeds the {x.shape[1]} local "
            f"rows per shard; use fewer shards or taller inputs"
        )
    n = axis_size(axis_name)
    fwd = [(i, i + 1) for i in range(n - 1)]   # my last rows → next device
    bwd = [(i + 1, i) for i in range(n - 1)]   # my first rows → prev device
    top = jax.lax.ppermute(x[:, x.shape[1] - halo:], axis_name, fwd)
    bot = jax.lax.ppermute(x[:, :halo], axis_name, bwd)
    return jnp.concatenate([top, x, bot], axis=1)


def stage_apply_context_parallel(
    stage,
    variables,
    x: jax.Array,
    size: Tuple[int, int],
    mesh: Mesh,
    axis_name: str = "ctx",
    domain_onehot: jax.Array | None = None,
    train: bool = False,
    rngs=None,
):
    """Run a token-space stage (``MHSAStage`` built with ``axis_name=``) with
    its ``(B, N, C)`` tokens row-sharded over ``mesh[axis_name]``.

    ``variables`` are the *same* params as the unsharded module (replicated);
    ``x`` is the full ``(B, H·W, C)`` token tensor. H must divide by the mesh
    axis size. Output is numerically the unsharded stage's output (exact up
    to fp reduction order).
    """
    h, w = size
    n = mesh.shape[axis_name]
    if h % n != 0:
        raise ValueError(f"grid height {h} not divisible by {n} shards")
    b, ntok, c = x.shape
    assert ntok == h * w, (ntok, h, w)
    h_loc = h // n
    x_grid = x.reshape(b, h, w, c)
    rngs = rngs or {}

    def local(vars_, xg, dom, rngs_):
        tokens = xg.reshape(b, h_loc * w, c)
        out = stage.apply(
            vars_, tokens, (h_loc, w), dom, train,
            rngs=rngs_ if rngs_ else None,
        )
        return out.reshape(b, h_loc, w, c)

    out = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, axis_name), P(), P()),
        out_specs=P(None, axis_name),
        check_vma=False,
    )(variables, x_grid, domain_onehot, rngs)
    return out.reshape(b, ntok, c)


# --------------------------------------------------------------------------
# End-to-end context parallelism (GSPMD)
#
# The stage-level shard_map above inserts every collective by hand; for the
# FULL model (stem convs, strided patch embeds, token reshapes, bridge,
# decoder upsampling, BN moments) the TPU-native route is GSPMD: annotate the
# input image rows as sharded over the ``ctx`` mesh axis and let XLA's SPMD
# partitioner derive the halo exchanges for the spatial convolutions, the
# psums for the factorized attention's KᵀV/softmax reductions and the BN
# moments, and the sharded layouts through the (B,H,W,C)↔(B,H·W,C) reshapes
# (row-major, so row-sharded H maps to contiguous token shards). Everything
# is jitted on GLOBAL shapes, so the hash-RNG dropout/DropPath masks are
# bit-identical to the unsharded program — unlike the shard_map path, no
# decorrelation is needed, and numerics match exactly (up to fp reduction
# order in the collectives).
#
# CONSTRAINT (measured, not theoretical): every sharded spatial dim must be
# ≥ the ctx axis size. When a grid dim is SMALLER than the mesh axis (e.g. a
# 2×2 bridge grid over 4 shards, so some shards hold only padding), the SPMD
# partitioner's FORWARD is still exact but its BACKWARD is not: grads of
# every op upstream of the degenerate grid come out inflated ~3–4× (found by
# the gradient-parity test in tests/test_context_parallel.py; reproduced
# minimally on the CPU backend — clean at min-grid ≥ n_shards, broken below).
# BASE's deepest grid is img/32, hence the img_size ≥ 32·n_ctx guard below —
# which is no practical loss: CP exists for ≥512² inputs (n_ctx ≤ 16 there).

# total stem+patch-embed downsampling to the deepest (bridge) grid in the
# BASE/MDViT encoder (models/base.py: stem /4, three strided embeds /2 each)
_BASE_TOTAL_STRIDE = 32


def _check_min_grid(model, x, mesh: Mesh, axis_name: str) -> None:
    n_ctx = mesh.shape[axis_name]
    stride = getattr(model, "total_stride", _BASE_TOTAL_STRIDE)
    min_grid = x.shape[1] // stride
    if min_grid < n_ctx:
        raise ValueError(
            f"context parallelism needs every sharded grid dim >= the ctx "
            f"axis ({n_ctx}); input H={x.shape[1]} reaches a "
            f"{min_grid}x{min_grid} deepest grid (total stride {stride}). "
            f"XLA SPMD's backward is measurably wrong (~3-4x inflated "
            f"grads) when shards of a dim are pure padding — use "
            f"img_size >= {stride * n_ctx} or a smaller ctx axis."
        )
    if "data" in mesh.axis_names:
        # Composed DP×CP meshes have a second measured failure mode: with a
        # 1-sample × 1-row shard tile at the deepest grid, SPMD corrupts the
        # deepest decoder's BN stat update (~2x) and shifts the loss ~1e-4 —
        # clean as soon as either factor is >= 2 (verified at img64/B4 and
        # img128/B2 on a (2,2) mesh; broken only at img64/B2).
        n_data = mesh.shape["data"]
        if x.shape[0] % n_data:
            raise ValueError(
                f"batch {x.shape[0]} not divisible by the data axis "
                f"({n_data})")
        if (x.shape[0] // n_data) * (min_grid // n_ctx) < 2:
            raise ValueError(
                f"DP x CP composed mesh needs >= 2 samples-or-rows per "
                f"shard at the deepest grid: batch/data = "
                f"{x.shape[0] // n_data}, grid/ctx = {min_grid // n_ctx} "
                f"(XLA SPMD miscompiles the 1x1-tile case; see module "
                f"notes). Grow the batch, the image, or shrink the mesh."
            )


def make_context_mesh(n_devices: int | None = None,
                      axis_name: str = "ctx") -> Mesh:
    """A 1-D mesh over the token/row axis (sequence parallelism)."""
    from mdvit_tpu.parallel.mesh import make_mesh

    return make_mesh(n_devices, axis_name=axis_name)


def make_dp_context_mesh(n_data: int, n_ctx: int,
                         axis_names: Tuple[str, str] = ("data", "ctx"),
                         ) -> Mesh:
    """A 2-D ``(data, ctx)`` mesh: batch sharded over ``data``, image rows
    over ``ctx``. The CP entry points below shard on BOTH axes whenever the
    mesh carries a ``data`` axis, composing data and sequence parallelism
    in one jitted program (GSPMD inserts the grad all-reduce over ``data``
    and the halo/psum collectives over ``ctx``)."""
    import numpy as np

    devices = jax.devices()
    need = n_data * n_ctx
    if need > len(devices):
        raise ValueError(
            f"requested a {n_data}x{n_ctx} mesh but only {len(devices)} "
            "devices are visible")
    return Mesh(np.array(devices[:need]).reshape(n_data, n_ctx), axis_names)


def _rows_spec(mesh: Mesh, axis_name: str) -> P:
    """Batch on ``data`` too when the mesh has that axis (DP×CP)."""
    batch_axis = "data" if "data" in mesh.axis_names else None
    return P(batch_axis, axis_name)


def model_apply_context_parallel(model, variables, x, domain_onehot,
                                 mesh: Mesh, axis_name: str = "ctx",
                                 train: bool = False, rngs=None,
                                 **apply_kwargs):
    """Full-model forward with image rows (hence every stage's token grid)
    sharded over ``mesh[axis_name]`` via GSPMD. ``x`` is the global
    ``(B, H, W, C)`` batch; params/outputs are replicated."""
    _check_min_grid(model, x, mesh, axis_name)
    rep = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, _rows_spec(mesh, axis_name))

    @functools.partial(jax.jit, in_shardings=(rep, rows, rep),
                       out_shardings=rep)
    def fwd(v, xx, oh):
        return model.apply(v, xx, oh, train=train,
                           rngs=rngs, **apply_kwargs)

    return fwd(variables, x, domain_onehot)


def make_context_parallel_train_step(model, tx, mesh: Mesh,
                                     axis_name: str = "ctx"):
    """A jitted single-loss (BASE-family) train step whose activations are
    row-sharded over ``mesh[axis_name]`` end-to-end: input batch sharded on
    H, params/optimizer state replicated, gradients reduced by GSPMD.

    This is the training-side counterpart of
    ``model_apply_context_parallel`` — sequence parallelism for
    high-resolution inputs whose activation footprint exceeds one chip's
    HBM (grads/optimizer are small here: ~35 M params). Exactness vs the
    unsharded step is pinned by tests/test_context_parallel.py (losses,
    gradients, and BN stats; see that test for why raw post-Adam params
    are only bounded). Requires img_size ≥ 32·n_ctx — see module notes on
    the degenerate-shard backward miscompile.
    """
    import optax

    from mdvit_tpu.train.losses import seg_loss_from_logits

    rep = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, _rows_spec(mesh, axis_name))

    @functools.partial(
        jax.jit,
        in_shardings=((rep, rep, rep), rows, rows, rep, rep),
        out_shardings=((rep, rep, rep), rep),
    )
    def step(state, x, y, onehot, rng):
        _check_min_grid(model, x, mesh, axis_name)  # shapes concrete at trace
        params, batch_stats, opt_state = state

        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                x, onehot, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"],
            )
            return seg_loss_from_logits(out["seg"], y), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return (new_params, new_stats, new_opt), loss

    return step
