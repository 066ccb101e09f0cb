"""Minimal torch re-implementation of the reference architecture, used ONLY
as a numerics oracle in tests (torch CPU is available; timm is not).

This mirrors the timm modules the reference instantiates
(VisionTransformer w/ packed SwiGLU, layerscale, reg tokens; the ViTMatte
Detail_Capture decoder) closely enough to produce state dicts with the
reference's key layout, so the import path is exercised end-to-end.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class OracleAttention(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, s, d = x.shape
        qkv = self.qkv(x).reshape(b, s, 3, self.num_heads, d // self.num_heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        out = F.scaled_dot_product_attention(q, k, v)
        return self.proj(out.transpose(1, 2).reshape(b, s, d))


class OracleSwiGLU(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden * 2)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        x1, x2 = self.fc1(x).chunk(2, dim=-1)
        return self.fc2(F.silu(x1) * x2)


class OracleGeluMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class LayerScale(nn.Module):
    def __init__(self, dim, init=1e-5):
        super().__init__()
        self.gamma = nn.Parameter(init * torch.ones(dim))

    def forward(self, x):
        return x * self.gamma


class OracleBlock(nn.Module):
    def __init__(self, dim, heads, hidden, swiglu=True, ls=True):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = OracleAttention(dim, heads)
        self.ls1 = LayerScale(dim) if ls else nn.Identity()
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = OracleSwiGLU(dim, hidden) if swiglu else OracleGeluMlp(dim, hidden)
        self.ls2 = LayerScale(dim) if ls else nn.Identity()

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        x = x + self.ls2(self.mlp(self.norm2(x)))
        return x


class OracleViT(nn.Module):
    """timm-like ViT with reference key names (patch_embed.proj, blocks.N.*,
    cls_token, reg_token, pos_embed, norm)."""

    def __init__(self, img_size=32, patch=4, dim=32, depth=2, heads=2,
                 hidden=64, reg_tokens=4, swiglu=True, ls=True,
                 no_embed_class=True):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, stride=patch)
        grid = img_size // patch
        self.grid = grid
        self.no_embed_class = no_embed_class
        self.num_prefix = 1 + reg_tokens
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        if reg_tokens:
            self.reg_token = nn.Parameter(torch.randn(1, reg_tokens, dim) * 0.02)
        else:
            self.reg_token = None
        n_pos = grid * grid if no_embed_class else self.num_prefix + grid * grid
        self.pos_embed = nn.Parameter(torch.randn(1, n_pos, dim) * 0.02)
        self.blocks = nn.ModuleList(
            [OracleBlock(dim, heads, hidden, swiglu, ls) for _ in range(depth)]
        )
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):  # x NCHW
        x = self.patch_embed.proj(x)
        b, d, gh, gw = x.shape
        x = x.flatten(2).transpose(1, 2)
        prefix = [self.cls_token.expand(b, -1, -1)]
        if self.reg_token is not None:
            prefix.append(self.reg_token.expand(b, -1, -1))
        if self.no_embed_class:
            x = x + self.pos_embed
            x = torch.cat(prefix + [x], dim=1)
        else:
            x = torch.cat(prefix + [x], dim=1)
            x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


class OracleBasicConv(nn.Module):
    def __init__(self, cin, cout, stride=2):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class OracleSegHead(nn.Sequential):
    """Sequential(attention, conv, activation) with reference key layout
    ('0.psi.{0,1,3}', '1')."""

    def __init__(self, cin):
        att = nn.Module()
        att.psi = nn.Sequential(
            nn.Conv2d(cin, cin // 2, 1, bias=True),
            nn.BatchNorm2d(cin // 2),
            nn.ReLU(),
            nn.Conv2d(cin // 2, 1, 1, bias=True),
            nn.Sigmoid(),
        )
        att.forward = lambda x, m=att: x * m.psi(x)
        conv = nn.Conv2d(cin, 1, 3, padding=1)
        super().__init__(att, conv, nn.Tanh())

    def forward(self, x):
        x = self[0].forward(x)
        x = self[1](x)
        return self[2](x)


class OracleDecoder(nn.Module):
    def __init__(self, emb, out_chans, convstream=(48, 96, 192),
                 fusion=(256, 128, 64, 32)):
        super().__init__()
        self.convstream = nn.Module()
        chans = (3,) + tuple(convstream)
        self.convstream.convs = nn.ModuleList(
            [OracleBasicConv(chans[i], chans[i + 1]) for i in range(3)]
        )
        fus = (emb,) + tuple(fusion)
        cc = chans
        self.fusion_blks = nn.ModuleList()
        for i in range(4):
            blk = nn.Module()
            blk.conv = OracleBasicConv(fus[i] + cc[-(i + 1)], fus[i + 1], stride=1)
            self.fusion_blks.append(blk)
        self.out_chans = out_chans
        for k in range(out_chans):
            setattr(self, f"segmentation_head_{k}", OracleSegHead(fusion[-1]))

    def forward(self, feats, images):
        details = [images]
        x = images
        for conv in self.convstream.convs:
            x = conv(x)
            details.append(x)
        x = feats
        for i, blk in enumerate(self.fusion_blks):
            up = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
            x = blk.conv(torch.cat([details[3 - i], up], dim=1))
        outs = [getattr(self, f"segmentation_head_{k}")(x)
                for k in range(self.out_chans)]
        return torch.cat(outs, dim=1)


class OracleMiphei(nn.Module):
    def __init__(self, vit, decoder, num_prefix, grid, target_grid):
        super().__init__()
        self.encoder = nn.Module()
        self.encoder.vit = vit
        self.decoder = decoder
        self.num_prefix = num_prefix
        self.grid = grid
        self.target_grid = target_grid

    def forward(self, x):
        tokens = self.encoder.vit(x)
        tokens = tokens[:, self.num_prefix:]
        b, n, d = tokens.shape
        feats = tokens.transpose(1, 2).reshape(b, d, self.grid, self.grid)
        if self.target_grid != self.grid:
            feats = F.interpolate(feats, size=(self.target_grid,) * 2, mode="bicubic")
        return self.decoder(feats, x)
