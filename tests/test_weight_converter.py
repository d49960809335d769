"""Round-trip parity for ``scripts/convert_torch_weights.py`` (C44).

The reference's TransFuse is *defined* by ImageNet-pretrained backbones
(``TransFuse.py:86,189,293``: torchvision resnet34/50 with layer4 removed;
``DeiT.py:94-185``: timm deit with the cls-token dropped and the pos-embed
bilinearly resized). torchvision/timm are not installed here, so the torch
side is built from minimal modules that reproduce their EXACT state-dict
schemas and forward semantics (torchvision ``resnet.py`` BasicBlock/
Bottleneck; the reference's own ``vision_transformer.py:240-330`` ViT) —
random torch weights → convert → flax forward must equal the torch forward.
"""
import math

import jax
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from mdvit_tpu.models.transfuse import DeiT as FlaxDeiT, ResNetStem3Stages
from scripts.convert_torch_weights import (
    convert_deit,
    convert_resnet,
    resize_pos_embed,
)

torch.manual_seed(0)


# ------------------------- torch reference modules -------------------------


class BasicBlock(nn.Module):
    """torchvision.models.resnet.BasicBlock (schema + semantics)."""

    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(out + identity)


class Bottleneck(nn.Module):
    """torchvision.models.resnet.Bottleneck (schema + semantics)."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(out + identity)


class TorchResNet3Stages(nn.Module):
    """torchvision resnet34/50 through layer3 — the exact slice TransFuse
    uses (``TransFuse.py:85-87,437-458``: layer4/fc replaced by Identity)."""

    def __init__(self, block, layers=(3, 4, 6)):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)

    def _make_layer(self, block, planes, n, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1, stride,
                          bias=False),
                nn.BatchNorm2d(planes * block.expansion),
            )
        blocks = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, n):
            blocks.append(block(self.inplanes, planes))
        return nn.Sequential(*blocks)

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        c1 = self.layer1(x)
        c2 = self.layer2(c1)
        c3 = self.layer3(c2)
        return c1, c2, c3


class TorchViTBlock(nn.Module):
    """timm/reference pre-LN block (``vision_transformer.py:222-236``)."""

    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.attn.proj = nn.Linear(dim, dim)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.mlp.fc2 = nn.Linear(int(dim * mlp_ratio), dim)
        self.heads = heads

    def _attn(self, x):
        b, n, c = x.shape
        h = self.heads
        qkv = self.attn.qkv(x).reshape(b, n, 3, h, c // h).permute(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = (q @ k.transpose(-2, -1)) * (c // h) ** -0.5
        a = a.softmax(dim=-1)
        return self.attn.proj((a @ v).transpose(1, 2).reshape(b, n, c))

    def forward(self, x):
        x = x + self._attn(self.norm1(x))
        h = self.mlp.fc1(self.norm2(x))
        h = F.gelu(h)
        return x + self.mlp.fc2(h)


class TorchDeiT(nn.Module):
    """The reference's DeiT (``DeiT.py:27-48``): patch conv → +pos (cls
    dropped, resized) → blocks → final LN. State-dict keys follow timm
    (``patch_embed.proj``, ``pos_embed``, ``blocks.i.*``, ``norm``)."""

    def __init__(self, embed_dim=96, depth=3, heads=6, pretrain_grid=14):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, embed_dim, 16, 16)
        n = pretrain_grid * pretrain_grid + 1  # +cls, like the checkpoints
        self.pos_embed = nn.Parameter(torch.randn(1, n, embed_dim) * 0.02)
        self.blocks = nn.ModuleList(
            [TorchViTBlock(embed_dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(embed_dim, eps=1e-6)

    def resized_pos(self, gh, gw):
        """``DeiT.py:104-111``: drop cls, reshape to the pretrain grid,
        F.interpolate(bilinear, align_corners=True) to (gh, gw)."""
        pe = self.pos_embed[:, 1:, :].detach()
        side = int(math.isqrt(pe.shape[1]))
        pe = pe.transpose(-1, -2).reshape(1, -1, side, side)
        pe = F.interpolate(pe, size=(gh, gw), mode="bilinear",
                           align_corners=True)
        return pe.flatten(2).transpose(-1, -2)

    def forward(self, x, gh, gw):
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = x + self.resized_pos(gh, gw)
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


def _timm_state_dict(m: TorchDeiT):
    """Rename ModuleList keys to the timm dotted schema (blocks.0.attn.qkv…)
    — identical already, since nn.ModuleList indexes with dots."""
    return {k: v.detach() for k, v in m.state_dict().items()}


# --------------------------------- tests ----------------------------------


def test_resize_pos_embed_matches_torch_interpolate():
    """Our numpy pos-embed resize must equal torch's
    F.interpolate(align_corners=True) — square (``DeiT.py:104-111``) and the
    non-square (24, 32) grid of deit_base_384 (``DeiT.py:178-181``)."""
    rs = np.random.RandomState(0)
    pe = rs.randn(1, 14 * 14 + 1, 8).astype(np.float32)
    for grid in [16, 4, (24, 32), (6, 9)]:
        gh, gw = (grid, grid) if isinstance(grid, int) else grid
        ours = resize_pos_embed(pe, grid)
        t = torch.from_numpy(pe[:, 1:, :]).transpose(-1, -2).reshape(
            1, 8, 14, 14)
        t = F.interpolate(t, size=(gh, gw), mode="bilinear",
                          align_corners=True)
        t = t.flatten(2).transpose(-1, -2).numpy()
        np.testing.assert_allclose(ours, t, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("arch,block", [("resnet34", BasicBlock),
                                        ("resnet50", Bottleneck)])
def test_resnet_round_trip_forward_parity(arch, block):
    tm = TorchResNet3Stages(block).eval()
    # randomize running stats so the BN conversion is actually exercised
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_resnet(sd, arch)

    x = np.random.RandomState(1).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        t1, t2, t3 = tm(torch.from_numpy(x))

    fm = ResNetStem3Stages(arch=arch)
    outs = jax.jit(lambda v, xx: fm.apply(v, xx, False))(
        {"params": params, "batch_stats": stats},
        np.transpose(x, (0, 2, 3, 1)))
    for ours, ref in zip(outs, (t1, t2, t3)):
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=1e-4)


def test_deit_round_trip_forward_parity():
    """Full DeiT branch parity incl. the pos-embed resize from the 14×14
    pretrain grid down to the 4×4 grid of a 64² input."""
    ed, depth, heads = 96, 3, 6
    tm = TorchDeiT(embed_dim=ed, depth=depth, heads=heads).eval()
    sd = _timm_state_dict(tm)
    sd_np = {k: v.numpy() for k, v in sd.items()}
    params = convert_deit(sd_np, grid=4, depth=depth)

    x = np.random.RandomState(2).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), 4, 4).numpy()

    fm = FlaxDeiT(img_size=64, embed_dim=ed, depth=depth, num_heads=heads)
    ours = jax.jit(lambda v, xx: fm.apply(v, xx))(
        {"params": params}, np.transpose(x, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-4)


def test_deit_non_square_grid_round_trip():
    """deit_base_384 geometry: pos-embed resized to (gh, gw) = (3, 4), input
    48×64 (the TransFuse_L_384 path at miniature scale)."""
    ed, depth, heads = 48, 2, 4
    tm = TorchDeiT(embed_dim=ed, depth=depth, heads=heads).eval()
    sd_np = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_deit(sd_np, grid=(3, 4), depth=depth)

    x = np.random.RandomState(3).randn(1, 3, 48, 64).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), 3, 4).numpy()

    fm = FlaxDeiT(img_size=(48, 64), embed_dim=ed, depth=depth,
                  num_heads=heads)
    ours = jax.jit(lambda v, xx: fm.apply(v, xx))(
        {"params": params}, np.transpose(x, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-4)
