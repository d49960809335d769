"""Layout-preserving Pallas depthwise-conv kernels for CPE/CRPE.

Motivation (round-3 device profile, README §Performance): 7 ms/step (16% of
device time) is layout copies clustered at the token↔grid boundaries around
the CPE/CRPE depthwise convs — XLA's convolutions want spatial-minor layouts
while the surrounding matmuls want feature-minor ``{2,1,0}``. Two fixes were
measured and REJECTED: shift-add convs in XLA (the 9 padded shift terms
re-read activations 9× from HBM, 341 → 233 img/s) and grid-native MHSA
stages (the attention contractions lose their preferred matmul layouts,
343 → 308 img/s). This module is the third way: a Pallas kernel consumes the
activation in its native row-major/feature-minor layout (a free bitcast from
the ``(B, N, C)`` token tensor), performs the 2-D depthwise conv on a padded
VMEM scratch — each activation is read from HBM exactly once — and writes
the result back in token-friendly layout. The matmul layouts are untouched
and the conv-side copies have nothing left to re-layout.

Two fused primitives (both stride-1, SAME padding, odd K):

* ``cpe_conv(x, w, b)``     → ``dwconv(x) + b + x``     (ConvPosEnc,
  reference ``mpvit.py:229-248`` — residual fused so the sum never makes an
  extra HBM round trip)
* ``crpe_conv(q, v, w, b)`` → ``q · (dwconv(v) + b)``   (ConvRelPosEnc,
  ``mpvit.py:251-318`` — the gate is fused so ``conv_v`` is never
  materialised in HBM)

Custom VJPs implement the backward as Pallas kernels too (dx/dv via the
flipped-kernel conv identity; dw/db accumulated in fp32 across the
sequential batch grid), so the training step's conv-backward layout copies
disappear as well.

Dispatch mirrors ``ops/pallas_attention``: the ``MDVIT_DWCONV`` env var or
``set_dwconv_impl()`` selects ``'pallas'``/``'xla'``; non-TPU backends always
take the XLA path (CPU parity tests are unaffected; interpret-mode tests
live in tests/test_pallas_dwconv.py).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mdvit_tpu.ops.pallas_attention import pallas_supported

_IMPL = os.environ.get("MDVIT_DWCONV", "xla")


def set_dwconv_impl(impl: str) -> None:
    global _IMPL
    assert impl in ("xla", "pallas")
    _IMPL = impl


def dwconv_impl() -> str:
    return _IMPL


def use_pallas_dwconv() -> bool:
    # Single-chip scope: pallas_call has no GSPMD partitioning rule, so a
    # multi-device mesh (data-parallel trainer, dryrun_multichip) must take
    # the XLA path; callers additionally gate on axis_name (context
    # parallelism) themselves.
    return (_IMPL == "pallas" and pallas_supported()
            and len(jax.devices()) == 1)


# ---------------------------------------------------------------- kernels

def _zero_pad_into(pad_ref, x, p: int, h: int, w: int):
    pad_ref[:] = jnp.zeros(pad_ref.shape, pad_ref.dtype)
    pad_ref[p:p + h, p:p + w, :] = x.astype(pad_ref.dtype)


def _conv_from_pad(pad_ref, w_ref, k: int, h: int, w: int, flip: bool = False):
    """Σ_ky,kx pad[ky:ky+h, kx:kx+w, :] · w[ky,kx,:] in fp32 (VMEM reads)."""
    acc = None
    for ky in range(k):
        for kx in range(k):
            wy, wx = (k - 1 - ky, k - 1 - kx) if flip else (ky, kx)
            wv = w_ref[wy, wx, :].reshape(1, 1, -1).astype(jnp.float32)
            term = pad_ref[ky:ky + h, kx:kx + w, :].astype(jnp.float32) * wv
            acc = term if acc is None else acc + term
    return acc


def _cpe_fwd_kernel(x_ref, w_ref, b_ref, o_ref, pad_ref, *, K, H, W):
    p = K // 2
    x = x_ref[0]
    _zero_pad_into(pad_ref, x, p, H, W)
    acc = _conv_from_pad(pad_ref, w_ref, K, H, W)
    acc += b_ref[0].reshape(1, 1, -1).astype(jnp.float32)
    acc += x.astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _cpe_bwd_kernel(x_ref, w_ref, g_ref, dx_ref, dw_ref, db_ref,
                    xpad_ref, gpad_ref, *, K, H, W):
    p = K // 2

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
        db_ref[:] = jnp.zeros(db_ref.shape, db_ref.dtype)

    g = g_ref[0].astype(jnp.float32)
    _zero_pad_into(gpad_ref, g_ref[0], p, H, W)
    # dx = conv(g, flip(w)) + g  (the +g is the fused residual's gradient)
    acc = _conv_from_pad(gpad_ref, w_ref, K, H, W, flip=True) + g
    dx_ref[0] = acc.astype(dx_ref.dtype)

    _zero_pad_into(xpad_ref, x_ref[0], p, H, W)
    for ky in range(K):
        for kx in range(K):
            s = jnp.sum(
                xpad_ref[ky:ky + H, kx:kx + W, :].astype(jnp.float32) * g,
                axis=(0, 1),
            )
            dw_ref[ky, kx, :] += s
    db_ref[0, :] += jnp.sum(g, axis=(0, 1))


def _crpe_fwd_kernel(q_ref, v_ref, w_ref, b_ref, o_ref, pad_ref, *, K, H, W):
    p = K // 2
    _zero_pad_into(pad_ref, v_ref[0], p, H, W)
    acc = _conv_from_pad(pad_ref, w_ref, K, H, W)
    acc += b_ref[0].reshape(1, 1, -1).astype(jnp.float32)
    o_ref[0] = (q_ref[0].astype(jnp.float32) * acc).astype(o_ref.dtype)


def _crpe_bwd_kernel(q_ref, v_ref, g_ref, w_ref, b_ref,
                     dq_ref, dv_ref, dw_ref, db_ref,
                     vpad_ref, upad_ref, *, K, H, W):
    p = K // 2

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
        db_ref[:] = jnp.zeros(db_ref.shape, db_ref.dtype)

    _zero_pad_into(vpad_ref, v_ref[0], p, H, W)
    conv_v = _conv_from_pad(vpad_ref, w_ref, K, H, W)
    conv_v += b_ref[0].reshape(1, 1, -1).astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    q = q_ref[0].astype(jnp.float32)
    dq_ref[0] = (g * conv_v).astype(dq_ref.dtype)

    u = g * q  # cotangent into conv_v
    _zero_pad_into(upad_ref, u, p, H, W)
    dv_ref[0] = _conv_from_pad(upad_ref, w_ref, K, H, W, flip=True).astype(
        dv_ref.dtype)
    for ky in range(K):
        for kx in range(K):
            s = jnp.sum(
                vpad_ref[ky:ky + H, kx:kx + W, :].astype(jnp.float32) * u,
                axis=(0, 1),
            )
            dw_ref[ky, kx, :] += s
    db_ref[0, :] += jnp.sum(u, axis=(0, 1))


# ---------------------------------------------------------- pallas_call glue

def _img_spec(h, w, c):
    return pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _w_spec(k, c):
    return pl.BlockSpec((k, k, c), lambda i: (0, 0, 0),
                        memory_space=pltpu.VMEM)


def _b_spec(c):
    return pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _cost(b, h, w, c, k, n_imgs, itemsize=2):
    return pl.CostEstimate(
        flops=2 * b * h * w * c * k * k,
        bytes_accessed=n_imgs * b * h * w * c * itemsize,
        transcendentals=0,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def cpe_conv_pallas(x, w, b, interpret=False):
    """``dwconv(x, w) + b + x`` fused; x (B,H,W,C), w (K,K,C), b (C,)."""
    return _cpe_fwd(x, w, b, interpret)


def _cpe_fwd(x, w, b, interpret):
    bsz, h, wd, c = x.shape
    k = w.shape[0]
    return pl.pallas_call(
        functools.partial(_cpe_fwd_kernel, K=k, H=h, W=wd),
        grid=(bsz,),
        in_specs=[_img_spec(h, wd, c), _w_spec(k, c), _b_spec(c)],
        out_specs=_img_spec(h, wd, c),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + k - 1, wd + k - 1, c), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=_cost(bsz, h, wd, c, k, 2, x.dtype.itemsize),
        interpret=interpret,
    )(x, w, b.reshape(1, c))


def _cpe_vjp_fwd(x, w, b, interpret):
    return _cpe_fwd(x, w, b, interpret), (x, w)


def _cpe_vjp_bwd(interpret, res, g):
    x, w = res
    bsz, h, wd, c = x.shape
    k = w.shape[0]
    dx, dw, db = pl.pallas_call(
        functools.partial(_cpe_bwd_kernel, K=k, H=h, W=wd),
        grid=(bsz,),
        in_specs=[_img_spec(h, wd, c), _w_spec(k, c), _img_spec(h, wd, c)],
        out_specs=(_img_spec(h, wd, c), _w_spec(k, c), _b_spec(c)),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((k, k, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((h + k - 1, wd + k - 1, c), x.dtype),
            pltpu.VMEM((h + k - 1, wd + k - 1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=_cost(bsz, h, wd, c, k, 4, x.dtype.itemsize),
        interpret=interpret,
    )(x, w, g)
    return dx, dw.astype(w.dtype), db.reshape(c).astype(w.dtype)


cpe_conv_pallas.defvjp(_cpe_vjp_fwd, _cpe_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def crpe_conv_pallas(q, v, w, b, interpret=False):
    """``q · (dwconv(v, w) + b)`` fused; q/v (B,H,W,C), w (K,K,C), b (C,)."""
    return _crpe_fwd_call(q, v, w, b, interpret)


def _crpe_fwd_call(q, v, w, b, interpret):
    bsz, h, wd, c = v.shape
    k = w.shape[0]
    return pl.pallas_call(
        functools.partial(_crpe_fwd_kernel, K=k, H=h, W=wd),
        grid=(bsz,),
        in_specs=[_img_spec(h, wd, c), _img_spec(h, wd, c),
                  _w_spec(k, c), _b_spec(c)],
        out_specs=_img_spec(h, wd, c),
        out_shape=jax.ShapeDtypeStruct(v.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + k - 1, wd + k - 1, c), v.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=_cost(bsz, h, wd, c, k, 3, v.dtype.itemsize),
        interpret=interpret,
    )(q, v, w, b.reshape(1, c))


def _crpe_vjp_fwd(q, v, w, b, interpret):
    return _crpe_fwd_call(q, v, w, b, interpret), (q, v, w, b)


def _crpe_vjp_bwd(interpret, res, g):
    q, v, w, b = res
    bsz, h, wd, c = v.shape
    k = w.shape[0]
    dq, dv, dw, db = pl.pallas_call(
        functools.partial(_crpe_bwd_kernel, K=k, H=h, W=wd),
        grid=(bsz,),
        in_specs=[_img_spec(h, wd, c), _img_spec(h, wd, c),
                  _img_spec(h, wd, c), _w_spec(k, c), _b_spec(c)],
        out_specs=(_img_spec(h, wd, c), _img_spec(h, wd, c),
                   _w_spec(k, c), _b_spec(c)),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct((k, k, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((h + k - 1, wd + k - 1, c), v.dtype),
            pltpu.VMEM((h + k - 1, wd + k - 1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=_cost(bsz, h, wd, c, k, 6, v.dtype.itemsize),
        interpret=interpret,
    )(q, v, g, w, b.reshape(1, c))
    return dq, dv, dw.astype(w.dtype), db.reshape(c).astype(b.dtype)


crpe_conv_pallas.defvjp(_crpe_vjp_fwd, _crpe_vjp_bwd)


# ------------------------------------------------------------ XLA reference

def cpe_conv_xla(x, w, b):
    """Same math via lax conv (CPU tests / fallback); fp32 semantics match
    the nn.Conv the CPE used previously (ambient precision)."""
    k = w.shape[0]
    p = k // 2
    c = x.shape[-1]
    out = jax.lax.conv_general_dilated(
        x, w.reshape(k, k, 1, c), (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    ) + b
    return out + x


def crpe_conv_xla(q, v, w, b):
    k = w.shape[0]
    p = k // 2
    c = v.shape[-1]
    conv_v = jax.lax.conv_general_dilated(
        v, w.reshape(k, k, 1, c), (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    ) + b
    return q * conv_v
