"""Golden numerical parity of a full Sup-gated serial block vs PyTorch.

Independently re-derives the reference block math in torch from the formulas
(CPE residual depthwise conv → LN → qkv → k-softmax-over-tokens → two einsums
→ multi-window CRPE → head-softmax domain gate → proj → +residual → LN → MLP
→ +residual; ``mpvit.py:229-418``, ``mdvit.py:243-361``), copies OUR
initialized weights into it, and demands matching outputs. This pins:

* the flat (B,N,C) block-masked attention == per-head reference math,
* the fused single-conv CRPE == three split depthwise convs,
* the head-major channel layout across qkv/CRPE/gate,
* the gate (softmax over heads per channel) semantics,
* CPE/LN/MLP wiring order.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from mdvit_tpu.models.blocks import MHSAStage

B, H, W, DIM, HEADS, DOMS = 2, 8, 8, 16, 8, 4
N = H * W
CH = DIM // HEADS
WINDOWS = {3: 2, 5: 3, 7: 3}


def torch_block(params, x_np, oh_np):
    """Reference-math forward in torch using our params."""
    p = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64), params)
    x = torch.from_numpy(x_np.astype(np.float64))  # (B, N, C)
    oh = torch.from_numpy(oh_np.astype(np.float64))

    def conv_dw(x2d, kernel, bias, groups_ch):
        # flax (kh,kw,1,C) -> torch (C,1,kh,kw)
        w = torch.from_numpy(np.transpose(kernel, (3, 2, 0, 1)))
        b = torch.from_numpy(bias)
        pad = kernel.shape[0] // 2
        return F.conv2d(x2d, w, b, padding=pad, groups=groups_ch)

    def linear(t, kern, bias=None):
        w = torch.from_numpy(np.transpose(kern, (1, 0)))
        b = torch.from_numpy(bias) if bias is not None else None
        return F.linear(t, w, b)

    def layernorm(t, scale, bias):
        return F.layer_norm(t, (t.shape[-1],),
                            torch.from_numpy(scale), torch.from_numpy(bias),
                            eps=1e-6)

    # CPE: depthwise conv + residual on the 2-D grid
    grid = x.transpose(1, 2).reshape(B, DIM, H, W)
    grid = conv_dw(grid, p["cpe"]["proj"]["kernel"],
                   p["cpe"]["proj"]["bias"], DIM) + grid
    x = grid.flatten(2).transpose(1, 2)  # (B, N, C)

    blk = p["block0"]
    cur = layernorm(x, blk["norm1"]["scale"], blk["norm1"]["bias"])

    att = blk["factoratt_crpe"]
    qkv = linear(cur, att["qkv"]["kernel"], att["qkv"]["bias"])
    qkv = qkv.reshape(B, N, 3, HEADS, CH).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # (B, h, N, ch)

    k_softmax = k.softmax(dim=2)
    ktv = torch.einsum("bhnk,bhnv->bhkv", k_softmax, v)
    factor_att = torch.einsum("bhnk,bhkv->bhnv", q, ktv)

    # CRPE: per-window depthwise convs on v in 2-D layout, gated by q
    v_img = v.permute(0, 1, 3, 2).reshape(B, HEADS * CH, H, W)
    splits = [h_split * CH for h_split in WINDOWS.values()]
    v_parts = torch.split(v_img, splits, dim=1)
    conv_parts = []
    for (win, _), part in zip(WINDOWS.items(), v_parts):
        kern = p["crpe"][f"w{win}"]
        bias = p["crpe"][f"b{win}"]
        conv_parts.append(conv_dw(part, kern, bias, part.shape[1]))
    conv_v = torch.cat(conv_parts, dim=1)
    conv_v = conv_v.reshape(B, HEADS, CH, N).permute(0, 1, 3, 2)
    crpe = q * conv_v

    out = (CH ** -0.5) * factor_att + crpe  # (B, h, N, ch)

    # Sup gate: MLP(one-hot) -> (B, h, 1, ch), softmax over heads
    g = linear(oh, att["domain_layer_fc1"]["kernel"],
               att["domain_layer_fc1"]["bias"]).relu()
    g = linear(g, att["domain_layer_fc2"]["kernel"],
               att["domain_layer_fc2"]["bias"])
    g = g.reshape(B, HEADS, CH).softmax(dim=1).unsqueeze(2)
    out = g * out

    out = out.transpose(1, 2).reshape(B, N, DIM)
    out = linear(out, att["proj"]["kernel"], att["proj"]["bias"])
    x = x + out

    cur = layernorm(x, blk["norm2"]["scale"], blk["norm2"]["bias"])
    mlp = blk["mlp"]
    cur = linear(cur, mlp["fc1"]["kernel"], mlp["fc1"]["bias"])
    cur = F.gelu(cur)
    cur = linear(cur, mlp["fc2"]["kernel"], mlp["fc2"]["bias"])
    x = x + cur
    return x.numpy()


def test_serial_block_matches_torch_rederivation(rng):
    stage = MHSAStage(dim=DIM, num_layers=1, num_heads=HEADS, mlp_ratio=2,
                      sup=True, num_domains=DOMS, drop=0.0, drop_path=0.0)
    x = rng.randn(B, N, DIM).astype(np.float32)
    oh = np.eye(DOMS, dtype=np.float32)[rng.randint(0, DOMS, B)]
    variables = stage.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x), (H, W), jnp.asarray(oh), False,
    )
    got = np.asarray(
        jax.jit(
            lambda v: stage.apply(v, jnp.asarray(x), (H, W), jnp.asarray(oh),
                                  False)
        )(variables)
    )
    want = torch_block(variables["params"], x, oh)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
