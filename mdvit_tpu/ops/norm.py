"""Normalization layers with multi-domain semantics, TPU-native.

The reference processes each domain's minibatch in a *separate forward pass*
(``multi_train_MDViT.py:129-213``), so:

* shared BatchNorm sees single-domain batch statistics and its running stats
  are updated once per domain per step, sequentially
  (momentum-folded D times);
* DSN variants ("_M", e.g. ``mdvit.py:23-71``) hold one BatchNorm *per domain*
  (``nn.ModuleList`` indexed by ``int(d)``).

Here all domains ride in one stacked batch, so both behaviours become masked
moment computations driven by a per-sample one-hot domain tensor — pure data,
no control flow, one XLA program. Under pjit with the batch axis sharded, the
masked sums lower to cross-chip psums automatically.

``DomainBatchNorm`` covers four configurations:

====================  ==================  =========================
reference module      affine_per_domain   stats group/run per domain
====================  ==================  =========================
shared BN (parity)    False               group=True,  run=False
shared BN (joint)     False               group=False, run=False
DSN BN (``bns[d]``)   True                group=True,  run=True
====================  ==================  =========================

Normalization math matches torch BatchNorm2d: biased variance for the
forward, unbiased variance folded into running stats, momentum 0.1, eps 1e-5.
Statistics are always computed in float32 (except under the
``MDVIT_LN_NATIVE=1`` perf-ablation knob below).
"""
from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp

# Perf experiment knob: LayerNorm moments/affine in the INPUT dtype instead
# of fp32 (halves the VPU work of the LN chains when activations are bf16).
# Non-parity — bench/ablation use only; parity tests run with it unset.
_LN_NATIVE = os.environ.get("MDVIT_LN_NATIVE", "0") == "1"


class DomainBatchNorm(nn.Module):
    """Batch norm over NHWC (axis -1 features) with per-domain machinery.

    Call with ``x (B, H, W, C)`` (or ``(B, N, C)``) and ``domain_onehot
    (B, D)``. ``use_running_average=True`` → eval mode.
    """

    num_features: int
    num_domains: int = 1
    affine_per_domain: bool = False
    group_stats: bool = True  # train-time moments per domain group
    stats_per_domain: bool = False  # running stats kept per domain (DSN)
    momentum: float = 0.1
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        domain_onehot: jax.Array | None = None,
        use_running_average: bool = False,
    ) -> jax.Array:
        c = self.num_features
        d = self.num_domains
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        reduce_axes = tuple(range(1, x.ndim - 1))  # spatial axes
        n_spatial = 1
        for a in reduce_axes:
            n_spatial *= x.shape[a]

        if self.affine_per_domain:
            scale = self.param("scale", nn.initializers.ones, (d, c))
            bias = self.param("bias", nn.initializers.zeros, (d, c))
        else:
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))

        stats_shape = (d, c) if self.stats_per_domain else (c,)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(stats_shape, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(stats_shape, jnp.float32)
        )

        needs_domain = (
            self.affine_per_domain
            or self.stats_per_domain
            or (self.group_stats and not use_running_average)
        )
        if needs_domain and domain_onehot is None:
            if d == 1:
                domain_onehot = jnp.ones((x.shape[0], 1), jnp.float32)
            else:
                raise ValueError(
                    "DomainBatchNorm with num_domains>1 needs domain_onehot"
                )
        if domain_onehot is not None:
            oh = domain_onehot.astype(jnp.float32)  # (B, D)

        if use_running_average:
            if self.stats_per_domain:
                mean = oh @ ra_mean.value  # (B, C)
                var = oh @ ra_var.value
                mean = mean.reshape((-1,) + (1,) * len(reduce_axes) + (c,))
                var = var.reshape((-1,) + (1,) * len(reduce_axes) + (c,))
            else:
                mean, var = ra_mean.value, ra_var.value
            y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        else:
            if self.group_stats:
                # masked per-domain moments via two einsums
                s1 = jnp.sum(xf, axis=reduce_axes)  # (B, C)
                s2 = jnp.sum(xf * xf, axis=reduce_axes)  # (B, C)
                cnt = jnp.sum(oh, axis=0) * n_spatial  # (D,)
                cnt_safe = jnp.maximum(cnt, 1.0)[:, None]
                dmean = (oh.T @ s1) / cnt_safe  # (D, C)
                dvar = (oh.T @ s2) / cnt_safe - dmean * dmean
                dvar = jnp.maximum(dvar, 0.0)
                mean_b = oh @ dmean  # (B, C)
                var_b = oh @ dvar
                bshape = (-1,) + (1,) * len(reduce_axes) + (c,)
                y = (xf - mean_b.reshape(bshape)) * jax.lax.rsqrt(
                    var_b.reshape(bshape) + self.eps
                )
                if not self.is_initializing():
                    m = self.momentum
                    # unbiased variance for running stats (torch semantics)
                    denom = jnp.maximum(cnt - 1.0, 1.0)[:, None]
                    dvar_unb = dvar * cnt[:, None] / denom
                    present = (cnt > 0).astype(jnp.float32)[:, None]
                    if self.stats_per_domain:
                        new_mean = (1 - m * present) * ra_mean.value + (
                            m * present
                        ) * dmean
                        new_var = (1 - m * present) * ra_var.value + (
                            m * present
                        ) * dvar_unb
                    else:
                        # emulate the reference's D sequential updates of the
                        # shared running stats, in ascending domain order
                        new_mean, new_var = ra_mean.value, ra_var.value
                        for di in range(d):
                            p = present[di]
                            new_mean = (1 - m * p) * new_mean + m * p * dmean[di]
                            new_var = (1 - m * p) * new_var + m * p * dvar_unb[di]
                    ra_mean.value = new_mean
                    ra_var.value = new_var
            else:
                # joint moments over the whole stacked batch
                mean = jnp.mean(xf, axis=(0,) + reduce_axes)
                var = jnp.mean(xf * xf, axis=(0,) + reduce_axes) - mean * mean
                var = jnp.maximum(var, 0.0)
                y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
                if not self.is_initializing():
                    m = self.momentum
                    n = x.shape[0] * n_spatial
                    var_unb = var * n / max(n - 1, 1)
                    ra_mean.value = (1 - m) * ra_mean.value + m * mean
                    ra_var.value = (1 - m) * ra_var.value + m * var_unb

        if self.affine_per_domain:
            sc = (oh @ scale.astype(jnp.float32)).reshape(
                (-1,) + (1,) * len(reduce_axes) + (c,)
            )
            bi = (oh @ bias.astype(jnp.float32)).reshape(
                (-1,) + (1,) * len(reduce_axes) + (c,)
            )
            y = y * sc + bi
        else:
            y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(orig_dtype)


class DomainLayerNorm(nn.Module):
    """LayerNorm over the last axis with optionally per-domain affine params.

    Covers the reference's shared ``nn.LayerNorm(eps=1e-6)`` and the DSN
    ``norm1s/norm2s = ModuleList[num_domains]`` (``mdvit.py:377,392``): the
    per-domain affine is gathered per sample via the one-hot, so a mixed-domain
    batch normalizes exactly as D separate per-domain forwards would.
    """

    num_features: int
    num_domains: int = 1
    per_domain: bool = False
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, domain_onehot: jax.Array | None = None
    ) -> jax.Array:
        c = self.num_features
        orig_dtype = x.dtype
        cdt = orig_dtype if _LN_NATIVE else jnp.float32
        xf = x.astype(cdt)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + jnp.asarray(self.eps, cdt))
        if self.per_domain and domain_onehot is None:
            # same contract (and same escape hatch) as DomainBatchNorm
            if self.num_domains == 1:
                domain_onehot = jnp.ones((x.shape[0], 1), jnp.float32)
            else:
                raise ValueError(
                    "DomainLayerNorm(per_domain=True) with num_domains>1 "
                    "needs domain_onehot")
        if self.per_domain:
            scale = self.param(
                "scale", nn.initializers.ones, (self.num_domains, c)
            )
            bias = self.param(
                "bias", nn.initializers.zeros, (self.num_domains, c)
            )
            oh = domain_onehot.astype(cdt)
            sc = oh @ scale.astype(cdt)  # (B, C)
            bi = oh @ bias.astype(cdt)
            bshape = (-1,) + (1,) * (x.ndim - 2) + (c,)
            y = y * sc.reshape(bshape) + bi.reshape(bshape)
        else:
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            y = y * scale.astype(cdt) + bias.astype(cdt)
        return y.astype(orig_dtype)
