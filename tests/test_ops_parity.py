"""Numerical parity of the op library against PyTorch reference semantics.

These pin the exact torch behaviours the reference relies on:
bilinear interpolate (align_corners=False), Conv2d padding/grouping,
BatchNorm2d train/eval statistics, Hardswish, GELU, softmax.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mdvit_tpu.ops.resize import resize_bilinear
from mdvit_tpu.ops.layers import ConvBN, DWConvBN, Mlp, NormSpec
from mdvit_tpu.ops.norm import DomainBatchNorm, DomainLayerNorm


def t2j_nhwc(t: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def j2t_nchw(a) -> torch.Tensor:
    return torch.from_numpy(np.asarray(a).transpose(0, 3, 1, 2))


@pytest.mark.parametrize("in_size,out_size", [(8, 16), (16, 7), (32, 32), (7, 64)])
def test_resize_bilinear_matches_torch(rng, in_size, out_size):
    x = rng.randn(2, 3, in_size, in_size).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), size=(out_size, out_size), mode="bilinear",
        align_corners=False,
    ).numpy()
    got = resize_bilinear(
        jnp.asarray(x.transpose(0, 2, 3, 1)), (out_size, out_size)
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-5, atol=1e-5
    )


def test_hardswish_gelu_match_torch(rng):
    x = rng.randn(64).astype(np.float32) * 4
    np.testing.assert_allclose(
        np.asarray(jax.nn.hard_swish(jnp.asarray(x))),
        F.hardswish(torch.from_numpy(x)).numpy(),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(jax.nn.gelu(jnp.asarray(x), approximate=False)),
        F.gelu(torch.from_numpy(x)).numpy(),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize("stride,k,groups", [(1, 3, 1), (2, 3, 1), (1, 1, 1), (1, 3, 8), (2, 3, 8)])
def test_convbn_matches_torch_conv_bn_train(rng, stride, k, groups):
    """Conv(+pad)+BN train forward, shared BN with joint stats, one domain."""
    b, c_in, c_out, s = 4, 8, 16, 16
    x = rng.randn(b, c_in, s, s).astype(np.float32)

    tconv = torch.nn.Conv2d(c_in, c_out, k, stride, (k - 1) // 2,
                            groups=groups, bias=False)
    tbn = torch.nn.BatchNorm2d(c_out)
    tbn.train()
    want = tbn(tconv(torch.from_numpy(x))).detach().numpy()

    mod = ConvBN(features=c_out, kernel_size=k, stride=stride,
                 padding=(k - 1) // 2, groups=groups, act=None,
                 norm=NormSpec(num_domains=1, group_stats=False))
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = mod.init(jax.random.PRNGKey(0), xj, train=True)
    # copy torch conv weight: torch (out, in/groups, kh, kw) -> flax (kh, kw, in/groups, out)
    wt = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    params = dict(variables["params"])
    params["conv"] = {"kernel": jnp.asarray(wt)}
    got, _ = mod.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        xj, train=True, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=2e-4, atol=2e-4
    )


def test_domain_batchnorm_group_stats_equals_per_domain_torch(rng):
    """Stacked 2-domain batch with group_stats must equal two separate torch
    BN forwards (one per domain) — the reference's actual execution pattern."""
    b, c, s, d = 3, 8, 7, 2
    x0 = rng.randn(b, c, s, s).astype(np.float32)
    x1 = rng.randn(b, c, s, s).astype(np.float32) * 2 + 1

    tbn = torch.nn.BatchNorm2d(c)
    tbn.train()
    want0 = tbn(torch.from_numpy(x0)).detach().numpy()
    want1 = tbn(torch.from_numpy(x1)).detach().numpy()
    want_rm = tbn.running_mean.numpy().copy()
    want_rv = tbn.running_var.numpy().copy()

    mod = DomainBatchNorm(num_features=c, num_domains=d, group_stats=True)
    x = jnp.concatenate(
        [jnp.asarray(x0.transpose(0, 2, 3, 1)), jnp.asarray(x1.transpose(0, 2, 3, 1))]
    )
    oh = jnp.asarray(
        np.eye(d, dtype=np.float32)[np.repeat(np.arange(d), b)]
    )
    variables = mod.init(jax.random.PRNGKey(0), x, oh)
    got, updated = mod.apply(variables, x, oh, mutable=["batch_stats"])
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got[:b], want0, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got[b:], want1, rtol=1e-4, atol=1e-5)
    # running stats after two sequential torch updates == our folded update
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["mean"]), want_rm, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["var"]), want_rv, rtol=1e-4, atol=1e-5
    )


def test_domain_batchnorm_dsn_matches_separate_torch_bns(rng):
    """DSN mode = one BN per domain (reference ``Conv2d_BN_M``): params and
    running stats per domain, each updated only by its own samples."""
    b, c, s, d = 2, 4, 5, 3
    xs = [rng.randn(b, c, s, s).astype(np.float32) * (i + 1) for i in range(d)]
    tbns = [torch.nn.BatchNorm2d(c) for _ in range(d)]
    wants = []
    for bn, xx in zip(tbns, xs):
        bn.train()
        wants.append(bn(torch.from_numpy(xx)).detach().numpy())

    mod = DomainBatchNorm(
        num_features=c, num_domains=d, affine_per_domain=True,
        stats_per_domain=True, group_stats=True,
    )
    x = jnp.concatenate([jnp.asarray(xx.transpose(0, 2, 3, 1)) for xx in xs])
    oh = jnp.asarray(np.eye(d, dtype=np.float32)[np.repeat(np.arange(d), b)])
    variables = mod.init(jax.random.PRNGKey(0), x, oh)
    got, updated = mod.apply(variables, x, oh, mutable=["batch_stats"])
    got = np.asarray(got).transpose(0, 3, 1, 2)
    for i in range(d):
        np.testing.assert_allclose(
            got[i * b:(i + 1) * b], wants[i], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(updated["batch_stats"]["mean"])[i],
            tbns[i].running_mean.numpy(), rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(updated["batch_stats"]["var"])[i],
            tbns[i].running_var.numpy(), rtol=1e-4, atol=1e-5,
        )

    # eval mode: per-domain running stats are selected per sample
    got_eval = mod.apply(
        {"params": variables["params"], "batch_stats": updated["batch_stats"]},
        x, oh, use_running_average=True,
    )
    for i, bn in enumerate(tbns):
        bn.eval()
        want = bn(torch.from_numpy(xs[i])).detach().numpy()
        np.testing.assert_allclose(
            np.asarray(got_eval).transpose(0, 3, 1, 2)[i * b:(i + 1) * b],
            want, rtol=1e-4, atol=1e-5,
        )


def test_domain_layernorm_per_domain(rng):
    b, n, c, d = 4, 6, 8, 2
    x = rng.randn(b, n, c).astype(np.float32)
    dom = np.array([0, 1, 0, 1])
    oh = jnp.asarray(np.eye(d, dtype=np.float32)[dom])
    mod = DomainLayerNorm(num_features=c, num_domains=d, per_domain=True)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), oh)
    # give the two domains distinct affines
    params = {
        "scale": jnp.asarray(rng.randn(d, c).astype(np.float32)),
        "bias": jnp.asarray(rng.randn(d, c).astype(np.float32)),
    }
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x), oh))
    for i in range(b):
        ln = torch.nn.LayerNorm(c, eps=1e-6)
        ln.weight.data = torch.from_numpy(np.asarray(params["scale"][dom[i]]))
        ln.bias.data = torch.from_numpy(np.asarray(params["bias"][dom[i]]))
        want = ln(torch.from_numpy(x[i])).detach().numpy()
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_dwconvbn_out_grouping_matches_torch(rng):
    """Decoder variant: dw conv in=2C→C with groups=C then pw C→C
    (``Decoders.py:30-40``)."""
    b, c_out, s = 2, 8, 10
    c_in = 2 * c_out
    x = rng.randn(b, c_in, s, s).astype(np.float32)
    tdw = torch.nn.Conv2d(c_in, c_out, 3, 1, 1, groups=c_out, bias=False)
    tpw = torch.nn.Conv2d(c_out, c_out, 1, 1, 0, bias=False)
    tbn = torch.nn.BatchNorm2d(c_out)
    tbn.train()
    want = F.hardswish(tbn(tpw(tdw(torch.from_numpy(x))))).detach().numpy()

    mod = DWConvBN(features=c_out, kernel_size=3, dw_groups_on="out",
                   norm=NormSpec(group_stats=False))
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = mod.init(jax.random.PRNGKey(0), xj, train=True)
    params = dict(variables["params"])
    # torch grouped (C_out, 2, k, k) → decomposed depthwise (k, k, 2, C_out)
    params["dwconv_kernel"] = jnp.asarray(
        tdw.weight.detach().numpy().transpose(2, 3, 1, 0))
    params["pwconv"] = {"kernel": jnp.asarray(
        tpw.weight.detach().numpy().transpose(2, 3, 1, 0))}
    got, _ = mod.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        xj, train=True, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=2e-4, atol=2e-4
    )
