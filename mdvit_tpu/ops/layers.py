"""Conv/MLP building blocks shared by every model in the zoo.

TPU-native re-designs of the reference's L2 primitives
(``Models/Transformer/mpvit.py:51-201``, ``Models/Transformer/mdvit.py:23-240``,
``Models/Decoders.py:15-118``): NHWC layout, explicit torch-equivalent padding,
fp32 norms, and per-domain normalization folded into data (see ops/norm.py) so
the plain and "_M" (domain-specific-norm) reference variants are one module.
"""
from __future__ import annotations

import os
from typing import Callable, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mdvit_tpu.ops.initializers import conv_kaiming_fanout, dense_trunc_normal
from mdvit_tpu.ops.norm import DomainBatchNorm

# GELU implementation knob (read once at import, like MDVIT_DWCONV). The
# reference's GELU is exact erf (torch nn.GELU()). The round-4 elementwise
# ablation sweep attributed +6% end-to-end train throughput to the erf
# evaluation alone (MDVIT_GELU=tanh: 344.3 → 362–367 img/s across runs).
#
# Chasing that win parity-safely uncovered that the speed does NOT come
# from op counts — it is a STRUCTURAL fast lowering XLA:TPU applies to the
# exact ``jax.nn.gelu(approximate=True)`` graph shape
# ``x * (0.5 * (1 + tanh(b * (x + a * x**3))))``. Measured back-to-back on
# the full train step (img/s): exact erf 346.2; deg-15 clamped polynomial
# (fewer FLOPs than erf!) 318.4; 3-term tanh-argument variant with a clamp
# 343.8–345.6 (f32 or bf16 internals alike); the verbatim 2-term graph
# 365.7; the same graph with refit constants 365.5. Any structural
# deviation — a clamp, a Horner argument, an extra term — falls off the
# fast path and loses the entire win.
#
# Production bf16 therefore uses the verbatim structure with MINIMAX-REFIT
# constants targeting the exact erf GELU: max |err| 2.7e-4 forward /
# 8.7e-4 gradient (the Hendrycks constants give 4.7e-4 / 8.7e-4) — both
# far below bf16 resolution (eps ≈ 7.8e-3). On bf16 tensors its absolute
# deviation from the true GELU (≤9.3e-3, at O(1) values' half-ulp) is the
# same size as XLA's own erf-on-bf16 rounding (9.8e-3); the one behavioral
# difference is that deep-negative-tail outputs (|gelu| < ~5e-3, x around
# −3.5) can flush toward 0 where bf16 tanh saturates early — half a bf16
# ulp at unit activation scale. Pinned in tests/test_poly_gelu.py.
#
# Modes: auto (default) = fast for bf16 inputs / exact erf otherwise (fp32
# parity runs are untouched); erf / fast / tanh force one implementation
# (tanh = the stock Hendrycks constants, kept as the ablation knob).
_GELU_MODE = os.environ.get("MDVIT_GELU", "auto")

# Minimax fit of (b, a) in 0.5·x·(1+tanh(b(x+ax³))) to x·Φ(x) over [0,10];
# w is monotone (a>0) so no clamp is needed and the tails saturate exactly
# (tanh(w(8)) = 1.0 in f32 ⇒ gelu(x≥8) = x, gelu(x≤−8) = 0).
_GELU_FIT_B = 0.8001570785492365
_GELU_FIT_A = 0.043367601640219106


def fast_gelu(x: jax.Array) -> jax.Array:
    """erf-accurate GELU on XLA:TPU's fast tanh-GELU lowering.

    MUST keep the exact ``jax.nn.gelu(approximate=True)`` graph structure
    (including ``x ** 3``) — see the module comment for the measurements;
    only the two constants differ (refit to the exact erf GELU).
    """
    b = jnp.asarray(_GELU_FIT_B, x.dtype)
    cdf = 0.5 * (1.0 + jnp.tanh(b * (x + _GELU_FIT_A * (x ** 3))))
    return x * cdf


def _gelu(x: jax.Array) -> jax.Array:
    mode = _GELU_MODE
    if mode == "auto":
        mode = "fast" if x.dtype == jnp.bfloat16 else "erf"
    if mode == "fast":
        return fast_gelu(x)
    return jax.nn.gelu(x, approximate=(mode == "tanh"))


class NormSpec(NamedTuple):
    """How a conv-path BatchNorm behaves w.r.t. domains.

    dsn=False → the reference's shared BN; dsn=True → the "_M" per-domain BN.
    group_stats=True reproduces the reference's per-domain batch statistics
    (each domain forward saw only its own minibatch).
    """

    num_domains: int = 1
    dsn: bool = False
    group_stats: bool = True


def make_bn(features: int, spec: NormSpec, dtype=jnp.float32, name=None):
    return DomainBatchNorm(
        num_features=features,
        num_domains=spec.num_domains,
        affine_per_domain=spec.dsn,
        stats_per_domain=spec.dsn,
        group_stats=spec.group_stats,
        dtype=dtype,
        name=name,
    )


def get_act(name: str | None) -> Callable[[jax.Array], jax.Array]:
    if name is None:
        return lambda x: x
    return {
        "hardswish": jax.nn.hard_swish,
        "relu": jax.nn.relu,
        "relu6": jax.nn.relu6,
        "gelu": _gelu,
        "sigmoid": jax.nn.sigmoid,
    }[name]


# NOTE(perf): a shift-and-add depthwise conv (k² fused multiply-adds) was
# benchmarked as an alternative to XLA's depthwise lowering and LOST
# (280 → 258 img/s on the full train step) — XLA's true-depthwise convs are
# already well lowered on v5e; only the 2-input-channel grouped case needed
# the even/odd decomposition below.


def conv2d(
    features: int,
    kernel_size: int | Sequence[int],
    stride: int = 1,
    padding: int | tuple | None = None,
    groups: int = 1,
    use_bias: bool = True,
    dilation: int = 1,
    dtype=jnp.float32,
    name: str | None = None,
) -> nn.Conv:
    """torch-parity Conv2d: explicit symmetric padding, kaiming-fan_out init.

    ``padding`` may be an int (symmetric both axes) or an explicit
    ``((top, bottom), (left, right))`` tuple — the context-parallel conv path
    uses per-axis padding after a row-halo exchange (parallel/context.py).
    """
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    if padding is None:
        padding = (kernel_size[0] - 1) // 2 * dilation
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return nn.Conv(
        features=features,
        kernel_size=tuple(kernel_size),
        strides=(stride, stride),
        padding=padding,
        feature_group_count=groups,
        use_bias=use_bias,
        kernel_dilation=(dilation, dilation),
        kernel_init=conv_kaiming_fanout(groups),
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class PointwiseConv(nn.Module):
    """1×1 conv expressed as a feature-axis matmul (``dot_general``).

    Identical math, params, and init to ``conv2d(features, 1, 1, 0)`` —
    kernel ``(1, 1, C, O)``, bias ``(O,)``, kaiming-fan_out — but lowers to a
    dot instead of a convolution. This matters inside ``nn.vmap``-stacked
    per-domain modules (the MKD debranches, models/mdvit.py): a vmapped conv
    lowers to a grouped convolution whose feature-group dimension GSPMD
    cannot partition (it forces involuntary full rematerialization under a
    data-parallel mesh), while a vmapped dot is a batched matmul GSPMD
    shards cleanly.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param(
            "kernel", conv_kaiming_fanout(1), (1, 1, c, self.features)
        )
        y = jnp.dot(x.astype(self.dtype), kernel[0, 0].astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


def dense(features: int, use_bias: bool = True, dtype=jnp.float32, name=None):
    return nn.Dense(
        features=features,
        use_bias=use_bias,
        kernel_init=dense_trunc_normal(0.02),
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class ConvBN(nn.Module):
    """Conv (no bias) → BN → act. Reference ``Conv2d_BN`` (``mpvit.py:81-124``)
    and its DSN twin ``Conv2d_BN_M`` (``mdvit.py:23-70``) via ``norm.dsn``."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    padding: int | None = 0
    groups: int = 1
    act: str | None = None
    norm: NormSpec = NormSpec()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, domain_onehot=None, train: bool = False):
        x = conv2d(
            self.features,
            self.kernel_size,
            self.stride,
            self.padding,
            self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = make_bn(self.features, self.norm, self.dtype, name="bn")(
            x, domain_onehot, use_running_average=not train
        )
        return get_act(self.act)(x)


class DWConvBN(nn.Module):
    """Depthwise-separable conv → BN → act.

    Two reference wirings exist; ``pw_first=False`` covers both used shapes:

    * ``mdvit.py:74-123`` (patch embeds): dw ``in→in`` groups=in, then pw
      ``in→out`` — our default when ``dw_groups_on='in'``.
    * ``Decoders.py:15-63`` (decoder conv_after): dw ``in→out`` groups=out
      (2 input channels per group when in=2·out), then pw ``out→out`` —
      ``dw_groups_on='out'``.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    act: str | None = "hardswish"
    dw_groups_on: str = "in"  # 'in' | 'out'
    norm: NormSpec = NormSpec()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, domain_onehot=None, train: bool = False):
        in_ch = x.shape[-1]
        if self.dw_groups_on == "in":
            x = conv2d(
                in_ch,
                self.kernel_size,
                self.stride,
                groups=in_ch,
                padding=(self.kernel_size - 1) // 2,
                use_bias=False,
                dtype=self.dtype,
                name="dwconv",
            )(x)
            x = conv2d(
                self.features, 1, 1, 0, use_bias=False, dtype=self.dtype,
                name="pwconv",
            )(x)
        elif in_ch == 2 * self.features:
            # reference decoder wiring: Conv2d(2C→C, groups=C) — each output
            # channel sees input channels (2g, 2g+1). XLA lowers 2-ch-grouped
            # convs poorly; decompose into two TRUE depthwise convs over the
            # even/odd channel interleave and add (mathematically identical).
            k = self.kernel_size
            w = self.param(
                "dwconv_kernel",
                conv_kaiming_fanout(self.features),
                (k, k, 2, self.features),
            )
            pad = (k - 1) // 2
            x_even = x[..., 0::2]
            x_odd = x[..., 1::2]

            def dw(inp, kern):
                return jax.lax.conv_general_dilated(
                    inp.astype(self.dtype), kern.astype(self.dtype),
                    (self.stride, self.stride),
                    ((pad, pad), (pad, pad)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=self.features,
                )

            x = dw(x_even, w[:, :, 0:1]) + dw(x_odd, w[:, :, 1:2])
            x = conv2d(
                self.features, 1, 1, 0, use_bias=False, dtype=self.dtype,
                name="pwconv",
            )(x)
        else:
            x = conv2d(
                self.features,
                self.kernel_size,
                self.stride,
                groups=self.features,
                padding=(self.kernel_size - 1) // 2,
                use_bias=False,
                dtype=self.dtype,
                name="dwconv",
            )(x)
            x = conv2d(
                self.features, 1, 1, 0, use_bias=False, dtype=self.dtype,
                name="pwconv",
            )(x)
        x = make_bn(self.features, self.norm, self.dtype, name="bn")(
            x, domain_onehot, use_running_average=not train
        )
        return get_act(self.act)(x)


class DropPath(nn.Module):
    """Stochastic depth: per-sample residual drop (timm ``DropPath`` parity:
    keep-prob scaling, Bernoulli over the batch axis only)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class FastDropout(nn.Module):
    """Element dropout with counter-based hash bits.

    threefry mask generation dominates the whole forward on TPU (~22 ms of a
    25 ms stage for the big (B,N,8C) MLP masks); one tiny threefry draw seeds
    a SplitMix32 hash over element counters instead (see data/augment.py),
    preserving determinism w.r.t. the 'dropout' rng stream.

    Under context parallelism (``axis_name`` set, parallel/context.py) the
    element counters restart per token shard, so the shard index is folded
    into the seed to decorrelate the per-shard masks.
    """

    rate: float = 0.0
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.rate == 0.0 or not train:
            return x
        from mdvit_tpu.data.augment import fast_uniform

        keep = 1.0 - self.rate
        seed = jax.random.bits(self.make_rng("dropout"), (), jnp.uint32)
        if self.axis_name is not None:
            idx = jax.lax.axis_index(self.axis_name).astype(jnp.uint32)
            seed = seed ^ (idx * jnp.uint32(0x9E3779B9))
        u = fast_uniform(seed, x.shape)
        return jnp.where(u < keep, x / keep, jnp.zeros_like(x))


class Dropout2d(nn.Module):
    """Channel dropout over NHWC: zeroes whole channels per sample
    (torch ``nn.Dropout2d`` parity)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(
            rng, keep, (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
        )
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Mlp(nn.Module):
    """Transformer FFN: fc → act → drop → fc → drop (``mpvit.py:51-78``)."""

    hidden_features: int
    out_features: int | None = None
    act: str = "gelu"
    drop: float = 0.0
    axis_name: str | None = None  # context-parallel dropout decorrelation
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_f = self.out_features or x.shape[-1]
        x = dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = get_act(self.act)(x)
        x = FastDropout(self.drop, axis_name=self.axis_name, name="drop1")(
            x, train)
        x = dense(out_f, dtype=self.dtype, name="fc2")(x)
        x = FastDropout(self.drop, axis_name=self.axis_name, name="drop2")(
            x, train)
        return x
