"""Minimal torch re-implementation of the reference architecture, used ONLY
as a numerics oracle in tests (torch CPU is available; timm is not).

This mirrors the timm modules the reference instantiates
(VisionTransformer w/ packed SwiGLU, layerscale, reg tokens; the ViTMatte
Detail_Capture decoder) closely enough to produce state dicts with the
reference's key layout, so the import path is exercised end-to-end.
"""

import math

import numpy as np

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


# ---------------------------------------------------------------------------
# UNETR family (reference src/generators/unet.py key layout)


class OracleConv2DBlock(nn.Module):
    """reference unet.py:441-474: .block = Sequential(Conv, BN, ReLU, Drop)."""

    def __init__(self, cin, cout, k=3):
        super().__init__()
        self.block = nn.Sequential(
            nn.Conv2d(cin, cout, k, 1, (k - 1) // 2),
            nn.BatchNorm2d(cout),
            nn.ReLU(),
            nn.Dropout(0.0),
        )

    def forward(self, x):
        return self.block(x)


class OracleDeconv2DBlock(nn.Module):
    """reference unet.py:477-519: .block = Sequential(ConvT k2/s2, Conv,
    BN, ReLU, Drop)."""

    def __init__(self, cin, cout, k=3):
        super().__init__()
        self.block = nn.Sequential(
            nn.ConvTranspose2d(cin, cout, 2, 2, 0),
            nn.Conv2d(cout, cout, k, 1, (k - 1) // 2),
            nn.BatchNorm2d(cout),
            nn.ReLU(),
            nn.Dropout(0.0),
        )

    def forward(self, x):
        return self.block(x)


class OracleViTFeatureUpsampler(nn.Module):
    """reference unet.py:176-235 (Sequential slot 0 = Upsample/Identity)."""

    def __init__(self, embed_dim, scale_factor=None):
        super().__init__()
        if embed_dim < 512:
            s11, s12, bott = 256, 128, 312
        else:
            s11, s12, bott = 512, 256, 512
        up = (lambda: nn.Upsample(scale_factor=scale_factor, mode="nearest")
              ) if scale_factor else (lambda: nn.Identity())
        self.convsteam = nn.Sequential(OracleConv2DBlock(3, 32),
                                       OracleConv2DBlock(32, 64))
        self.upsampler0 = nn.Sequential(
            up(), OracleDeconv2DBlock(embed_dim, s11),
            OracleDeconv2DBlock(s11, s12), OracleDeconv2DBlock(s12, 128))
        self.upsampler1 = nn.Sequential(
            up(), OracleDeconv2DBlock(embed_dim, s11),
            OracleDeconv2DBlock(s11, 256))
        self.upsampler2 = nn.Sequential(
            up(), OracleDeconv2DBlock(embed_dim, bott))
        self.upsampler3 = nn.Sequential(up())

    def forward(self, x, feats):
        return [self.convsteam(x),
                self.upsampler0(feats[0]),
                self.upsampler1(feats[1]),
                self.upsampler2(feats[2]),
                self.upsampler3(feats[3])]


class OracleCellViTDecoder(nn.Module):
    """reference unet.py:288-404."""

    def __init__(self, enc_out_channels, out_channels=32):
        super().__init__()
        c0, c1, c2, c3, c4 = enc_out_channels
        self.bottleneck_upsampler = nn.ConvTranspose2d(c4, c3, 2, 2, 0)
        self.decoder3_upsampler = nn.Sequential(
            OracleConv2DBlock(c3 * 2, c3), OracleConv2DBlock(c3, c3),
            OracleConv2DBlock(c3, c3), nn.ConvTranspose2d(c3, c2, 2, 2, 0))
        self.decoder2_upsampler = nn.Sequential(
            OracleConv2DBlock(c2 * 2, c2), OracleConv2DBlock(c2, c2),
            nn.ConvTranspose2d(c2, c1, 2, 2, 0))
        self.decoder1_upsampler = nn.Sequential(
            OracleConv2DBlock(c1 * 2, c1), OracleConv2DBlock(c1, c1),
            nn.ConvTranspose2d(c1, c0, 2, 2, 0))
        self.decoder0_header = nn.Sequential(
            OracleConv2DBlock(c0 * 2, c0), OracleConv2DBlock(c0, c0),
            nn.Conv2d(c0, out_channels, 1, 1, 0))

    def forward(self, feats):
        z0, z1, z2, z3, z4 = feats
        b4 = self.bottleneck_upsampler(z4)
        b3 = self.decoder3_upsampler(torch.cat([z3, b4], 1))
        b2 = self.decoder2_upsampler(torch.cat([z2, b3], 1))
        b1 = self.decoder1_upsampler(torch.cat([z1, b2], 1))
        return self.decoder0_header(torch.cat([z0, b1], 1))


class OracleUnetr(nn.Module):
    """Full UNETR with 'encoder.model.' timm-ViT keys, matching
    unetr_from_torch's expected layout (import_weights.py:389-466)."""

    def __init__(self, vit: "OracleViT", img_size, patch, out_chans=16,
                 decoder_out_channels=32):
        super().__init__()
        self.encoder = nn.Module()
        self.encoder.model = vit
        depth = len(vit.blocks)
        if depth == 4:
            self.extract_layers = [0, 1, 2, 3]
        else:
            self.extract_layers = np.round(
                np.linspace(depth // 4, depth - 1, 4)).astype(int).tolist()
        scale = None
        if patch != 16:
            scale = int(img_size / 16) / int(img_size / patch)
        emb = vit.pos_embed.shape[-1]
        self.encoder.feature_upsampler = OracleViTFeatureUpsampler(
            emb, scale_factor=scale)
        out_ch = (64, 128, 256, 312 if emb < 512 else 512, emb)
        self.decoder = OracleCellViTDecoder(out_ch, decoder_out_channels)
        self.out_chans = out_chans
        for k in range(out_chans):
            setattr(self, f"segmentation_head_{k}",
                    OracleSegHead(decoder_out_channels))
        self.grid = img_size // patch

    def vit_taps(self, x):
        """timm forward_intermediates(norm=False, NCHW) equivalent:
        block outputs at extract_layers, prefix dropped, token grid."""
        vit = self.encoder.model
        h = vit.patch_embed.proj(x)
        b, d, gh, gw = h.shape
        h = h.flatten(2).transpose(1, 2)
        prefix = [vit.cls_token.expand(b, -1, -1)]
        if vit.reg_token is not None:
            prefix.append(vit.reg_token.expand(b, -1, -1))
        if vit.no_embed_class:
            h = h + vit.pos_embed
            h = torch.cat(prefix + [h], dim=1)
        else:
            h = torch.cat(prefix + [h], dim=1)
            h = h + vit.pos_embed
        taps = []
        want = set(self.extract_layers)
        for i, blk in enumerate(vit.blocks):
            h = blk(h)
            if i in want:
                t = h[:, vit.num_prefix:]
                taps.append(t.transpose(1, 2).reshape(b, d, gh, gw))
        return taps

    def forward(self, x):
        feats = self.vit_taps(x)
        feats = self.encoder.feature_upsampler(x, feats)
        h = self.decoder(feats)
        outs = [getattr(self, f"segmentation_head_{k}")(h)
                for k in range(self.out_chans)]
        return torch.cat(outs, 1)


# ---------------------------------------------------------------------------
# Swin (timm layout/semantics) + HEMIT HybridSwinT
# (reference hemit_models.py:489-533 builds the branch via
# timm.models.swin_transformer.SwinTransformer; the oracle implements
# timm's documented semantics independently of the jax module code)


def _rel_index(win):
    import itertools

    idx = torch.zeros(win * win, win * win, dtype=torch.long)
    coords = list(itertools.product(range(win), range(win)))
    for a, (ya, xa) in enumerate(coords):
        for b, (yb, xb) in enumerate(coords):
            dy, dx = ya - yb + win - 1, xa - xb + win - 1
            idx[a, b] = dy * (2 * win - 1) + dx
    return idx


class OracleWindowAttention(nn.Module):
    def __init__(self, dim, heads, win, qkv_bias=False):
        super().__init__()
        self.heads, self.win = heads, win
        self.qkv = nn.Linear(dim, 3 * dim, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * win - 1) ** 2, heads))
        self.register_buffer("rel_index", _rel_index(win), persistent=False)

    def forward(self, x, mask=None):
        # x: [Bw, N, C]
        bw, n, c = x.shape
        d = c // self.heads
        q, k, v = self.qkv(x).reshape(bw, n, 3, self.heads, d).permute(
            2, 0, 3, 1, 4)
        logits = (q * d ** -0.5) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.rel_index.reshape(-1)].reshape(n, n, self.heads)
        logits = logits + bias.permute(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            logits = logits.view(bw // nw, nw, self.heads, n, n) \
                + mask[None, :, None]
            logits = logits.view(bw, self.heads, n, n)
        attn = logits.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(bw, n, c)
        return self.proj(out)


class OracleSwinBlock(nn.Module):
    """timm SwinTransformerBlock: per-block window/shift clamped to the
    stage grid (_calc_window_shift), cyclic shift + region mask."""

    def __init__(self, dim, heads, grid, window, shift, mlp_ratio=4.0,
                 qkv_bias=False):
        super().__init__()
        self.grid = grid
        self.win = min(window, grid)
        self.shift = shift if grid > self.win else 0
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn = OracleWindowAttention(dim, heads, self.win, qkv_bias)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.mlp.fc2 = nn.Linear(int(dim * mlp_ratio), dim)
        if self.shift:
            m = torch.zeros(grid, grid, dtype=torch.long)
            cnt = 0
            for hs in (slice(0, -self.win), slice(-self.win, -self.shift),
                       slice(-self.shift, None)):
                for ws in (slice(0, -self.win), slice(-self.win, -self.shift),
                           slice(-self.shift, None)):
                    m[hs, ws] = cnt
                    cnt += 1
            mw = self._part(m[None, :, :, None]).squeeze(-1)   # [nW, n]
            diff = mw[:, None, :] - mw[:, :, None]
            self.register_buffer(
                "attn_mask", torch.where(diff != 0, -100.0, 0.0),
                persistent=False)
        else:
            self.attn_mask = None

    def _part(self, x):
        b, h, w, c = x.shape
        x = x.view(b, h // self.win, self.win, w // self.win, self.win, c)
        return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, self.win * self.win, c)

    def _unpart(self, x, b, h, w):
        c = x.shape[-1]
        x = x.view(b, h // self.win, w // self.win, self.win, self.win, c)
        return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)

    def forward(self, x):
        # x: [B, H, W, C]
        b, h, w, c = x.shape
        shortcut = x
        x = self.norm1(x)
        if self.shift:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
        x = self.attn(self._part(x), self.attn_mask)
        x = self._unpart(x, b, h, w)
        if self.shift:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = shortcut + x
        y = self.norm2(x)
        y = self.mlp.fc2(F.gelu(self.mlp.fc1(y)))
        return x + y


class OraclePatchMerging(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.norm = nn.LayerNorm(4 * dim_in, eps=1e-5)
        self.reduction = nn.Linear(4 * dim_in, dim_out, bias=False)

    def forward(self, x):
        b, h, w, c = x.shape
        x = x.view(b, h // 2, 2, w // 2, 2, c)
        x = torch.cat([x[:, :, 0, :, 0], x[:, :, 1, :, 0],
                       x[:, :, 0, :, 1], x[:, :, 1, :, 1]], -1)
        return self.reduction(self.norm(x))


class OracleSwinStage(nn.Module):
    def __init__(self, dim_in, dim_out, depth, heads, grid, window,
                 downsample, qkv_bias=False):
        super().__init__()
        self.downsample = (OraclePatchMerging(dim_in, dim_out)
                           if downsample else nn.Identity())
        self.blocks = nn.ModuleList([
            OracleSwinBlock(dim_out, heads, grid, window,
                            0 if i % 2 == 0 else window // 2, 4.0, qkv_bias)
            for i in range(depth)])

    def forward(self, x):
        x = self.downsample(x)
        for blk in self.blocks:
            x = blk(x)
        return x


class OracleSwin(nn.Module):
    """timm-layout SwinTransformer: patch_embed.proj/.norm, layers.{si}
    (downsample-first), final norm; returns (normed final, stage taps)."""

    def __init__(self, in_chans, embed_dim, depths, heads, window, patch,
                 grid0, qkv_bias=False):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(in_chans, embed_dim, patch, patch)
        self.patch_embed.norm = nn.LayerNorm(embed_dim, eps=1e-5)
        self.layers = nn.ModuleList()
        for si, (depth, h) in enumerate(zip(depths, heads)):
            dim = embed_dim * 2 ** si
            self.layers.append(OracleSwinStage(
                dim // 2, dim, depth, h, grid0 // 2 ** si, window,
                downsample=si > 0, qkv_bias=qkv_bias))
        self.norm = nn.LayerNorm(embed_dim * 2 ** (len(depths) - 1), eps=1e-5)

    def forward(self, x):
        # x: [B, C, H, W] -> NHWC tokens
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        x = self.patch_embed.norm(x)
        taps = []
        for layer in self.layers:
            x = layer(x)
            taps.append(x)
        return self.norm(x), taps


class OracleUpConv(nn.Sequential):
    """Decoder_hbrid upsample_and_conv slot: Upsample(2x bilinear
    align_corners=True) + Conv3x3 pad 1."""

    def __init__(self, cin, cout):
        super().__init__(
            nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True),
            nn.Conv2d(cin, cout, 3, 1, 1))


class OracleHybridSwinT(nn.Module):
    """HEMIT HybridSwinT (reference hemit_models.py:489-533 + Decoder_hbrid
    :571-681): CNN /8 front end -> timm Swin(patch 4) -> U-decoder over
    both branches' taps. Key layout matches hybrid_swint_from_torch."""

    def __init__(self, out_channels=3, cnn_channels=(16, 32, 64),
                 embed_dim=96, depths=(2, 2, 3, 1),
                 num_heads=(3, 6, 12, 24), window_size=4, patch_size=4,
                 img_size=256):
        super().__init__()
        layers = []
        cin = 3
        for ch in cnn_channels:
            layers += [nn.Conv2d(cin, ch, 3, 1, 1), nn.BatchNorm2d(ch),
                       nn.ReLU(), nn.MaxPool2d(2, 2)]
            cin = ch
        self.cnn_block = nn.Sequential(*layers)
        grid0 = img_size // 2 ** len(cnn_channels) // patch_size
        self.model = OracleSwin(cnn_channels[-1], embed_dim, depths,
                                num_heads, window_size, patch_size, grid0)
        d = embed_dim * 2 ** (len(depths) - 1)
        e = embed_dim
        c4 = (e // 4 + cnn_channels[2]) // 2
        c5 = (c4 // 2 + cnn_channels[1]) // 2
        c6 = (c5 // 2 + 1 + cnn_channels[0]) // 2
        self.decoder = nn.Module()
        dec = self.decoder
        dec.upsample_and_conv1 = OracleUpConv(d, d // 2)
        dec.conv1 = nn.Conv2d(d, d // 2, 3, 1, 1)
        dec.upsample_and_conv2 = OracleUpConv(d // 2, d // 4)
        dec.conv2 = nn.Conv2d(d // 2, d // 4, 3, 1, 1)
        dec.upsample_and_conv3 = OracleUpConv(d // 4, d // 8)
        dec.conv3 = nn.Conv2d(d // 4, d // 8, 3, 1, 1)
        dec.upsample_and_conv4 = OracleUpConv(d // 8, e // 2)
        dec.upsample_and_conv5 = OracleUpConv(e // 2, e // 4)
        dec.conv4 = nn.Conv2d(e // 4 + cnn_channels[2], c4, 3, 1, 1)
        dec.upsample_and_conv6 = OracleUpConv(c4, c4 // 2)
        dec.conv5 = nn.Conv2d(c4 // 2 + cnn_channels[1], c5, 3, 1, 1)
        dec.upsample_and_conv7 = OracleUpConv(c5, c5 // 2 + 1)
        dec.conv6 = nn.Conv2d(c5 // 2 + 1 + cnn_channels[0], c6, 3, 1, 1)
        dec.upsample_and_conv8 = OracleUpConv(c6, out_channels)

    def forward(self, x):
        cnn_taps = []
        h = x
        for i in range(0, len(self.cnn_block), 4):
            h = self.cnn_block[i + 3](self.cnn_block[i + 2](
                self.cnn_block[i + 1](self.cnn_block[i](h))))
            cnn_taps.append(h)
        root_tokens, taps = self.model(h)
        root = root_tokens.permute(0, 3, 1, 2)
        swin = [t.permute(0, 3, 1, 2) for t in taps]
        dec = self.decoder
        y = dec.upsample_and_conv1(root)
        y = dec.conv1(torch.cat([y, swin[2]], 1))
        y = dec.upsample_and_conv2(y)
        y = dec.conv2(torch.cat([y, swin[1]], 1))
        y = dec.upsample_and_conv3(y)
        y = dec.conv3(torch.cat([y, swin[0]], 1))
        y = dec.upsample_and_conv4(y)
        y = dec.upsample_and_conv5(y)
        y = dec.conv4(torch.cat([y, cnn_taps[2]], 1))
        y = dec.upsample_and_conv6(y)
        y = dec.conv5(torch.cat([y, cnn_taps[1]], 1))
        y = dec.upsample_and_conv7(y)
        y = dec.conv6(torch.cat([y, cnn_taps[0]], 1))
        return torch.tanh(dec.upsample_and_conv8(y))
