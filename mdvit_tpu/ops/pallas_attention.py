"""Fused factorized-attention Pallas TPU kernel.

The hot op of the whole framework (SURVEY §3 "hot loops ranked #1"): the
linear-attention core ``out = scale · Q · blockdiag(softmaxₙ(K)ᵀ V)`` that
runs inside every serial block (reference math ``mpvit.py:356-366``). The
flat block-masked formulation (models/blocks.py) is fused here into one
kernel per batch element:

* column softmax over the token axis (max/sum reductions in VMEM),
* ``KᵀV`` via one full-width MXU matmul, block-diagonal head mask applied in
  the epilogue,
* ``Q·(KᵀV)`` second MXU matmul, scale folded in.

No (B,N,C) softmax intermediate ever hits HBM. The custom VJP recomputes the
softmax in the backward (flash-attention-style rematerialisation) so the
residuals are just (q, k, v).

Shapes: q, k, v are (B, N, C) with N·C ≤ ~4096·512 — everything for one batch
element fits in VMEM at every MDViT stage. Falls back to the XLA einsum path
on non-TPU backends (pallas_supported()).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SOFTMAX_NATIVE = os.environ.get("MDVIT_SOFTMAX_NATIVE", "0") == "1"


def pallas_supported() -> bool:
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


# Global implementation switch. 'xla' is the default: on v5e the XLA-fused
# einsum chain benchmarks FASTER than the Pallas kernel at every MDViT stage
# shape (0.49 vs 0.63 ms at (16,4096,64)) because XLA batches the tiny
# per-sample matmuls while the kernel grid serialises them; the kernel is kept
# for its flash-style memory behaviour and as the base for future N-tiling.
_IMPL = "xla"


def set_attention_impl(impl: str) -> None:
    global _IMPL
    assert impl in ("xla", "pallas")
    _IMPL = impl


def attention_impl() -> str:
    return _IMPL


def dispatch_factorized_attention(q, k, v, ch: int, scale: float,
                                  axis_name: str | None = None):
    """q/k/v: (B, N, C) token layout or (B, H, W, C) grid layout.

    Grid layout runs the contraction directly over the two spatial axes
    (``bhwk,bhwv->bkv``) so token-space stages never materialise a
    (B, N, C) relayout of conv-produced activations. NOTE: measured SLOWER
    end-to-end than the token form (343.3 vs 307.7 img/s — the relayout
    copies buy better matmul layouts); production callers pass tokens, the
    grid form remains for layout-flexible callers."""
    if axis_name is not None:
        # context-parallel: tokens sharded over `axis_name` (shard_map body);
        # the fused kernel can't span shards, so use the collective XLA path.
        return factorized_attention_xla(q, k, v, ch, scale, axis_name)
    if _IMPL == "pallas" and pallas_supported():
        if q.ndim == 4:
            b, h, w, c = q.shape
            out = factorized_attention(
                q.reshape(b, h * w, c), k.reshape(b, h * w, c),
                v.reshape(b, h * w, c), ch, scale)
            return out.reshape(b, h, w, c)
        return factorized_attention(q, k, v, ch, scale)
    return factorized_attention_xla(q, k, v, ch, scale)


def _head_mask(c: int, ch: int, dtype=jnp.float32):
    ids = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0) // ch
    ids_t = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1) // ch
    return (ids == ids_t).astype(dtype)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, ch: int, scale: float):
    k = k_ref[0].astype(jnp.float32)  # (N, C)
    v = v_ref[0].astype(jnp.float32)
    q = q_ref[0].astype(jnp.float32)
    kmax = jnp.max(k, axis=0, keepdims=True)
    ke = jnp.exp(k - kmax)
    ks = ke / jnp.sum(ke, axis=0, keepdims=True)
    ktv = jax.lax.dot_general(
        ks, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (C, C)
    ktv = ktv * _head_mask(k.shape[1], ch)
    out = jnp.dot(q, ktv, preferred_element_type=jnp.float32) * scale
    o_ref[0] = out.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                *, ch: int, scale: float):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    c = k.shape[1]
    mask = _head_mask(c, ch)

    # recompute softmax (cheaper than materialising it in HBM)
    kmax = jnp.max(k, axis=0, keepdims=True)
    ke = jnp.exp(k - kmax)
    ks = ke / jnp.sum(ke, axis=0, keepdims=True)
    ktv = jax.lax.dot_general(
        ks, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * mask

    # out = scale · q @ ktv
    dq_ref[0] = (
        scale * jax.lax.dot_general(
            g, ktv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    ).astype(dq_ref.dtype)
    # dT = mask ⊙ (scale · qᵀ g)
    dt = scale * jax.lax.dot_general(
        q, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * mask  # (C_k, C_v)
    # dv = ks @ dT
    dv_ref[0] = jnp.dot(ks, dt, preferred_element_type=jnp.float32).astype(
        dv_ref.dtype)
    # dks = v @ dTᵀ ; dk via column-softmax jacobian
    dks = jax.lax.dot_general(
        v, dt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (N, C_k)
    inner = jnp.sum(ks * dks, axis=0, keepdims=True)
    dk_ref[0] = (ks * (dks - inner)).astype(dk_ref.dtype)


def _call_fwd(q, k, v, ch: int, scale: float):
    b, n, c = q.shape
    spec = pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, ch=ch, scale=scale),
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, n, c), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (n * c * c * 2),
            bytes_accessed=4 * b * n * c * 4,
            transcendentals=b * n * c,
        ),
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def factorized_attention(q, k, v, ch: int, scale: float):
    """``scale · q @ blockdiag_mask(softmaxₙ(k)ᵀ v)`` — fused on TPU."""
    return _call_fwd(q, k, v, ch, scale)


def _vjp_fwd(q, k, v, ch, scale):
    return _call_fwd(q, k, v, ch, scale), (q, k, v)


def _vjp_bwd(ch, scale, residuals, g):
    q, k, v = residuals
    b, n, c = q.shape
    spec = pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, ch=ch, scale=scale),
        grid=(b,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, c), q.dtype),
            jax.ShapeDtypeStruct((b, n, c), k.dtype),
            jax.ShapeDtypeStruct((b, n, c), v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (n * c * c * 5),
            bytes_accessed=7 * b * n * c * 4,
            transcendentals=b * n * c,
        ),
    )(q, k, v, g)
    return dq, dk, dv


factorized_attention.defvjp(_vjp_fwd, _vjp_bwd)


def factorized_attention_xla(q, k, v, ch: int, scale: float,
                             axis_name: str | None = None):
    """Reference XLA path (identical math) for CPU tests and fallback.

    With ``axis_name`` (context parallelism, parallel/context.py) the token
    axis N is a shard of the global sequence: the column softmax uses a
    ``pmax``/``psum`` of the (B, 1, C) row stats and the KᵀV Gram matrix is
    ``psum``-reduced — the only cross-shard communication in the whole
    attention (O(B·C²) bytes, independent of N).

    Inputs may be (B, N, C) tokens or (B, H, W, C) grids; the grid form
    contracts over both spatial axes in place (no token relayout).
    """
    c = q.shape[-1]
    tok_axes = (1,) if q.ndim == 3 else (1, 2)
    if axis_name is None:
        # MDVIT_SOFTMAX_NATIVE=1: perf ablation — column softmax in the
        # input dtype instead of fp32 (non-parity; bench use only).
        sdt = k.dtype if _SOFTMAX_NATIVE else jnp.float32
        ks = jax.nn.softmax(k.astype(sdt), axis=tok_axes).astype(q.dtype)
    else:
        kf = k.astype(jnp.float32)
        # stop_gradient BEFORE pmax: the max-shift cancels analytically in
        # softmax, and pmax has no differentiation rule — a zero tangent on
        # its input lets autodiff skip it entirely.
        kmax = jax.lax.pmax(
            jax.lax.stop_gradient(jnp.max(kf, axis=tok_axes, keepdims=True)),
            axis_name)
        ke = jnp.exp(kf - kmax)
        denom = jax.lax.psum(
            jnp.sum(ke, axis=tok_axes, keepdims=True), axis_name)
        ks = (ke / denom).astype(q.dtype)
    eq_kv = "bnk,bnv->bkv" if q.ndim == 3 else "bhwk,bhwv->bkv"
    eq_out = "bnk,bkv->bnv" if q.ndim == 3 else "bhwk,bkv->bhwv"
    ktv = jnp.einsum(eq_kv, ks, v, preferred_element_type=jnp.float32)
    if axis_name is not None:
        ktv = jax.lax.psum(ktv, axis_name)
    ids = jnp.arange(c) // ch
    mask = (ids[:, None] == ids[None, :]).astype(ktv.dtype)
    out = jnp.einsum(eq_out, q, (ktv * mask).astype(q.dtype),
                     preferred_element_type=jnp.float32)
    return (scale * out).astype(q.dtype)
