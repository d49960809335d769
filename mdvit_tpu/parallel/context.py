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

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


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
