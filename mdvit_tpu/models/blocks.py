"""The factorized-attention transformer substrate (MPViT/CoaT style).

TPU-first re-design of the reference's core blocks:

* ``ConvPosEnc`` (CPE) — ``mpvit.py:229-248``
* ``ConvRelPosEnc`` (CRPE) — ``mpvit.py:251-318``; the reference's per-window
  list of depthwise convs ({3:2,5:3,7:3} heads per window) is fused here into
  ONE depthwise conv whose kernel is assembled from zero-padded per-window
  weights — mathematically identical, one XLA conv instead of three.
* ``FactorAtt(+Sup)`` — linear-complexity attention ``Q·(softmaxₙ(K)ᵀV)``
  (``mpvit.py:321-373``), with the optional domain-adapter gate
  (``mdvit.py:243-313``): an MLP on the one-hot domain label produces a
  per-head gate, softmaxed over heads, multiplied into the attention output.
  The gate is data (per-sample one-hot), so a mixed-domain batch runs in one
  program.
* ``SerialBlock`` — CPE → LN → att → +droppath → LN → MLP → +droppath
  (``mdvit.py:316-361``); per-domain LayerNorms (``_M``, ``mdvit.py:364-412``)
  via ``dsn=True``.
* ``MHSAStage`` — shared CPE/CRPE + N serial blocks (``mdvit.py:415-469``).

Tokens are ``(B, N, C)`` with a static ``size=(H, W)`` grid; heads layout is
``(B, N, heads, ch)`` to avoid transposes around the einsums.
"""
from __future__ import annotations

from typing import Mapping, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mdvit_tpu.ops.layers import (
    DropPath,
    FastDropout,
    Mlp,
    NormSpec,
    dense,
)
from mdvit_tpu.ops.norm import DomainLayerNorm

# Attention contraction precision is inherited from the ambient
# jax.default_matmul_precision (tests pin 'highest' for torch parity; TPU
# training uses the fast default with fp32 accumulation via
# preferred_element_type)
_ATT_PREC = None

DEFAULT_CRPE_WINDOW: Mapping[int, int] = {3: 2, 5: 3, 7: 3}


def tokens_to_grid(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    if x.ndim == 4:  # already grid layout
        return x
    b, n, c = x.shape
    return x.reshape(b, size[0], size[1], c)


def grid_to_tokens(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c)


class _DWConvParams(nn.Module):
    """Parameter holder matching ``nn.Conv``'s tree for a depthwise conv:
    ``kernel (k,k,1,c)`` kaiming-fan_out + ``bias (c,)`` zeros. Lets the
    caller dispatch the compute (XLA conv vs Pallas kernel) while keeping
    checkpoints interchangeable with the previous ``nn.Conv``-based CPE."""

    dim: int
    k: int

    @nn.compact
    def __call__(self):
        from mdvit_tpu.ops.initializers import conv_kaiming_fanout

        kernel = self.param(
            "kernel", conv_kaiming_fanout(self.dim), (self.k, self.k, 1,
                                                      self.dim))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return kernel, bias


class ConvPosEnc(nn.Module):
    """Depthwise-conv positional encoding with residual (``mpvit.py:229``).

    ``axis_name`` (context parallelism): tokens are a row shard of the global
    grid; a ppermute halo exchange of ``k//2`` rows replaces the zero padding
    on H (parallel/context.py), keeping the conv output exactly the global
    conv's rows for this shard. Param tree is identical either way.

    On TPU with ``MDVIT_DWCONV=pallas`` the conv+bias+residual runs as one
    layout-preserving Pallas kernel (ops/pallas_dwconv.py) — the token→grid
    reshape becomes a free bitcast instead of an XLA conv-layout copy.
    """

    dim: int
    k: int = 3
    axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, size: Tuple[int, int]) -> jax.Array:
        from mdvit_tpu.ops import pallas_dwconv as pdw

        feat = tokens_to_grid(x, size)
        pad = self.k // 2
        kernel, bias = _DWConvParams(self.dim, self.k, name="proj")()
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        if self.axis_name is None and pdw.use_pallas_dwconv():
            res = pdw.cpe_conv_pallas(
                feat.astype(self.dtype), kernel.reshape(self.k, self.k,
                                                        self.dim), bias)
            return res if x.ndim == 4 else grid_to_tokens(res)
        if self.axis_name is None:
            inp, padding = feat, ((pad, pad), (pad, pad))
        else:
            from mdvit_tpu.parallel.context import halo_exchange_rows

            inp = halo_exchange_rows(feat, pad, self.axis_name)
            padding = ((0, 0), (pad, pad))
        out = jax.lax.conv_general_dilated(
            inp.astype(self.dtype), kernel, (1, 1), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.dim,
        ) + bias
        # cast the residual operand so both dispatch paths (XLA here, Pallas
        # above) emit self.dtype regardless of the input dtype
        res = out + feat.astype(self.dtype)
        return res if x.ndim == 4 else grid_to_tokens(res)


class ConvRelPosEnc(nn.Module):
    """Convolutional relative position encoding (``mpvit.py:251-318``).

    Per-window depthwise convs on V (grid layout) gated by Q. Kernels of all
    windows are zero-embedded into a single ``max_window²`` depthwise kernel:
    a k×k conv with pad k//2 equals a K×K conv with pad K//2 whose kernel is
    the k×k kernel centred among zeros, so one fused conv replaces the
    reference's split/conv/concat (layout-thrash-free on TPU).
    """

    ch_per_head: int
    num_heads: int
    window: Mapping[int, int] = None  # type: ignore[assignment]
    axis_name: str | None = None  # context-parallel halo exchange
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, q: jax.Array, v: jax.Array, size: Tuple[int, int]
    ) -> jax.Array:
        """q, v: (B, N, C) flat tokens or (B, H, W, C) grid (channels =
        heads·ch, head-major like the reference's
        ``rearrange 'B h (H W) Ch -> B (h Ch) H W'``). Grid inputs run the
        depthwise conv in place with no token relayout."""
        window = dict(self.window or DEFAULT_CRPE_WINDOW)
        assert sum(window.values()) == self.num_heads
        ch = self.ch_per_head
        h = self.num_heads
        b = q.shape[0]
        max_k = max(window)

        kernel_parts = []
        bias_parts = []
        for wk, heads_split in window.items():
            c_split = heads_split * ch
            # reference init after _init_weights: normal(0, sqrt(2/(k*k)))
            # (depthwise ⇒ fan_out = k·k·out/groups = k·k)
            std = (2.0 / (wk * wk)) ** 0.5
            wgt = self.param(
                f"w{wk}",
                lambda key, shape, s=std: s * jax.random.normal(key, shape),
                (wk, wk, 1, c_split),
            )
            bia = self.param(f"b{wk}", nn.initializers.zeros, (c_split,))
            pad = (max_k - wk) // 2
            wgt = jnp.pad(wgt, ((pad, pad), (pad, pad), (0, 0), (0, 0)))
            kernel_parts.append(wgt)
            bias_parts.append(bia)
        kernel = jnp.concatenate(kernel_parts, axis=-1)  # (K,K,1,h*ch)
        bias = jnp.concatenate(bias_parts)

        v_img = v if v.ndim == 4 else v.reshape(b, size[0], size[1], h * ch)
        pad = max_k // 2
        if self.axis_name is None:
            from mdvit_tpu.ops import pallas_dwconv as pdw

            if pdw.use_pallas_dwconv():
                # fused q·(dwconv(v)+bias) — conv_v never hits HBM and the
                # conv consumes v in its matmul-native layout (no copies)
                q_img = (q if q.ndim == 4
                         else q.reshape(b, size[0], size[1], h * ch))
                out = pdw.crpe_conv_pallas(
                    q_img.astype(self.dtype), v_img.astype(self.dtype),
                    kernel.reshape(max_k, max_k, h * ch).astype(self.dtype),
                    bias.astype(self.dtype))
                return out if q.ndim == 4 else out.reshape(b, q.shape[1],
                                                           h * ch)
            h_pad = (pad, pad)
        else:
            from mdvit_tpu.parallel.context import halo_exchange_rows

            v_img = halo_exchange_rows(v_img, pad, self.axis_name)
            h_pad = (0, 0)
        conv_v = jax.lax.conv_general_dilated(
            v_img.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=(h_pad, (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=h * ch,
            precision=_ATT_PREC,
        ) + bias.astype(self.dtype)
        q = q.astype(self.dtype)  # match the Pallas path's output dtype
        if q.ndim == 4:
            return q * conv_v
        return q * conv_v.reshape(b, q.shape[1], h * ch)


class FactorAtt(nn.Module):
    """Factorized attention with CRPE and optional domain-adapter gate.

    ``sup=False`` → reference ``FactorAtt_ConvRelPosEnc`` (``mpvit.py:321``);
    ``sup=True``  → ``FactorAtt_ConvRelPosEnc_Sup`` (``mdvit.py:243-313``):
    ``domain_layer`` MLP (D → max(dim//2,4) → heads·ch), reshaped to a
    per-head gate, softmax over heads, multiplied into scale·att + crpe.

    Kept name ``domain_layer`` is ABI: the MKD masked double-gradient
    (train/steps.py) matches parameter paths on this substring, as the
    reference matches ``'domain_layer' in name`` (``multi_train_MDViT.py:198``).
    """

    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    sup: bool = False
    num_domains: int = 4
    r: int = 2
    proj_drop: float = 0.0
    crpe: ConvRelPosEnc = None  # type: ignore[assignment]
    axis_name: str | None = None  # context-parallel token sharding
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        size: Tuple[int, int],
        domain_onehot: jax.Array | None = None,
        train: bool = False,
    ) -> jax.Array:
        # x: (B, N, C) tokens or (B, H, W, C) grid — the grid form keeps the
        # whole attention in the conv-native layout (no token relayout).
        b, c = x.shape[0], x.shape[-1]
        h = self.num_heads
        ch = c // h
        scale = ch ** -0.5

        qkv = dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="qkv")(x)
        q = qkv[..., 0:c]
        k = qkv[..., c:2 * c]
        v = qkv[..., 2 * c:3 * c]

        # Flat MXU-friendly formulation: keep (B, N, C) and compute the
        # per-head contractions as ONE full-width matmul with a block-diagonal
        # head mask — bit-equivalent to the reference's per-head einsums
        # (mpvit.py:356-360) with no head transposes. Dispatches to either the
        # XLA-fused chain or the Pallas kernel (ops/pallas_attention.py).
        from mdvit_tpu.ops.pallas_attention import dispatch_factorized_attention

        factor_att = dispatch_factorized_attention(
            q, k, v, ch, scale, self.axis_name
        ).astype(q.dtype)

        crpe = self.crpe(q, v, size)
        out = factor_att + crpe  # (B, N, C); scale folded into the kernel

        if self.sup:
            hidden = max(self.dim // self.r, 4)
            gate = dense(hidden, dtype=self.dtype, name="domain_layer_fc1")(
                domain_onehot.astype(out.dtype)
            )
            gate = jax.nn.relu(gate)
            gate = dense(h * ch, dtype=self.dtype, name="domain_layer_fc2")(gate)
            # softmax over heads per channel-position (mdvit.py:301-303)
            gate = gate.reshape(b, h, ch)
            gate = jax.nn.softmax(gate.astype(jnp.float32), axis=1)
            gate = gate.reshape((b,) + (1,) * (out.ndim - 2) + (c,))
            out = out * gate.astype(out.dtype)

        out = dense(c, dtype=self.dtype, name="proj")(out)
        out = FastDropout(self.proj_drop, axis_name=self.axis_name,
                          name="proj_drop")(out, train)
        return out


class SerialBlock(nn.Module):
    """CPE → LN → factor-att → +droppath → LN → MLP → +droppath
    (``mdvit.py:316-412``; ``dsn=True`` is the per-domain-LN ``_M`` variant).
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    drop_path: float = 0.0
    sup: bool = False
    dsn: bool = False
    num_domains: int = 4
    cpe: ConvPosEnc = None  # type: ignore[assignment]
    crpe: ConvRelPosEnc = None  # type: ignore[assignment]
    axis_name: str | None = None  # context-parallel token sharding
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        size: Tuple[int, int],
        domain_onehot: jax.Array | None = None,
        train: bool = False,
    ) -> jax.Array:
        ln = lambda name: DomainLayerNorm(
            num_features=self.dim,
            num_domains=self.num_domains,
            per_domain=self.dsn,
            dtype=self.dtype,
            name=name,
        )
        x = self.cpe(x, size)
        cur = ln("norm1")(x, domain_onehot)
        cur = FactorAtt(
            dim=self.dim,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            sup=self.sup,
            num_domains=self.num_domains,
            proj_drop=self.drop,
            crpe=self.crpe,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="factoratt_crpe",
        )(cur, size, domain_onehot, train)
        x = x + DropPath(self.drop_path, name="drop_path1")(cur, train)

        cur = ln("norm2")(x, domain_onehot)
        cur = Mlp(
            hidden_features=int(self.dim * self.mlp_ratio),
            drop=self.drop,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="mlp",
        )(cur, train)
        x = x + DropPath(self.drop_path, name="drop_path2")(cur, train)
        return x


class MHSAStage(nn.Module):
    """A stage: shared CPE + shared CRPE + ``num_layers`` serial blocks
    (``mdvit.py:415-469``). ``(B, N, C) → (B, N, C)`` tokens, or
    ``(B, H, W, C) → (B, H, W, C)`` grid — the grid form keeps every block
    in the conv-native layout (attention contracts over (h, w) in place)
    with no token relayout copies. Same params either way. NOTE: production
    callers use the TOKEN form — the grid form measured 10% slower
    end-to-end (the copies buy the matmul layouts; README rejected list)."""

    dim: int
    num_layers: int
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool = True
    drop: float = 0.0
    drop_path: float = 0.0
    drop_path_list: Sequence[float] | None = None  # per-block override
    sup: bool = False
    dsn: bool = False
    num_domains: int = 4
    crpe_window: Mapping[int, int] = None  # type: ignore[assignment]
    axis_name: str | None = None  # context-parallel token sharding
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.cpe = ConvPosEnc(dim=self.dim, k=3, axis_name=self.axis_name,
                              dtype=self.dtype)
        self.crpe = ConvRelPosEnc(
            ch_per_head=self.dim // self.num_heads,
            num_heads=self.num_heads,
            window=self.crpe_window or DEFAULT_CRPE_WINDOW,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )
        self.blocks = [
            SerialBlock(
                dim=self.dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop,
                drop_path=(
                    self.drop_path_list[i]
                    if self.drop_path_list is not None else self.drop_path
                ),
                sup=self.sup,
                dsn=self.dsn,
                num_domains=self.num_domains,
                cpe=self.cpe,
                crpe=self.crpe,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name=f"block{i}",
            )
            for i in range(self.num_layers)
        ]

    def __call__(
        self,
        x: jax.Array,
        size: Tuple[int, int],
        domain_onehot: jax.Array | None = None,
        train: bool = False,
    ) -> jax.Array:
        for blk in self.blocks:
            x = blk(x, size, domain_onehot, train)
        return x
