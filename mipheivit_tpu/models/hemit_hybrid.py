"""HEMIT zoo: the three Swin hybrid baseline generators.

Reference: src/generators/hemit_models.py —
  * ``HybridSwinT``        (:489, factory netG='swinT',     :57-70)
  * ``HybridSwinT_2``      (:684, factory netG='swinT_old', :71-83)
  * ``SwinUnetGenerator``  (:800, factory netG='SwinTUnet', :84-95)

All three pair a CNN branch with a timm Swin Transformer. Shapes here are
derived from the actual input instead of the ctor ``img_size`` reshape
games: the reference forwards are written against an ``img_size`` equal to
the *post-CNN* feature size (HybridSwinT's final ``x.reshape`` at :670-672
only works when ``img_size == input/8``), while the factory passes the full
crop size — a latent reference bug this rebuild does not reproduce. The
factory's ``output_nc`` is likewise swallowed by ``**kwargs`` in the
reference ctors (the decoders hard-code 3 output channels); here
``out_channels`` is honored and defaults to 3.

TPU notes: NHWC throughout; bilinear upsamples are interp-matrix einsums
(align_corners=True per the reference's nn.Upsample); ConvTranspose uses
the exact-torch-semantics op; everything is static-shape jittable.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.deconv import TorchConvTranspose
from ..ops.resize import resize_bilinear_nhwc
from .swin import SwinConfig, SwinTransformer


def _up2_ac(x):
    """torch nn.Upsample(scale_factor=2, bilinear, align_corners=True)."""
    return resize_bilinear_nhwc(x, (x.shape[1] * 2, x.shape[2] * 2),
                                align_corners=True)


class _UpConv(nn.Module):
    """Upsample(2x, bilinear, align_corners=True) + Conv3x3 pad 1."""

    out_ch: int

    @nn.compact
    def __call__(self, x):
        x = _up2_ac(x)
        return nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv", dtype=x.dtype)(x)


class _CnnStage(nn.Module):
    """Conv3x3(s1,p1) + BN + ReLU + MaxPool2 (reference :506-514, :697-706)."""

    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv", dtype=x.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn", dtype=x.dtype)(x)
        x = nn.relu(x)
        return nn.max_pool(x, (2, 2), strides=(2, 2))


def _grid(tokens_nhwc):
    return tokens_nhwc


class HybridSwinT(nn.Module):
    """CNN /8 front end -> Swin(patch 4) -> U-style decoder over both
    branches' taps (reference :489-533 forward, Decoder_hbrid :571-681).

    CNN taps after each MaxPool (strides 2/4/8); Swin taps after each
    stage's blocks before the next downsample (strides 32/64/128 of the
    input). The decoder climbs back through all six taps.
    """

    out_channels: int = 3
    cnn_channels: Sequence[int] = (16, 32, 64)
    embed_dim: int = 96
    depths: Sequence[int] = (1, 1, 3, 1)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 8
    patch_size: int = 4
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(jnp.dtype(self.dtype))
        cnn_taps = []
        h = x
        for i, ch in enumerate(self.cnn_channels):
            h = _CnnStage(ch, name=f"cnn{i}")(h, train)
            cnn_taps.append(h)

        swin_cfg = SwinConfig(
            img_size=(h.shape[1], h.shape[2]), patch_size=self.patch_size,
            embed_dim=self.embed_dim, depths=tuple(self.depths),
            num_heads=tuple(self.num_heads), window_size=self.window_size,
            qkv_bias=False, dtype=self.dtype)
        # collect='stage_out': post-block taps; the reference appends before
        # each downsample (:521-525), which is the same tensor.
        feats_full, swin_taps = SwinTransformer(swin_cfg, name="swinT")(
            h, collect="stage_out")
        # final normed stage output as the decoder root (reference :527-530)
        gh = h.shape[1] // (self.patch_size * 2 ** (len(self.depths) - 1))
        gw = h.shape[2] // (self.patch_size * 2 ** (len(self.depths) - 1))
        root = feats_full.reshape(h.shape[0], gh, gw, -1)

        d = self.embed_dim * 2 ** (len(self.depths) - 1)   # 768
        y = _UpConv(d // 2, name="upsample_and_conv1")(root)
        y = jnp.concatenate([y, swin_taps[2]], axis=-1)
        y = nn.Conv(d // 2, (3, 3), padding=((1, 1), (1, 1)), name="conv1",
                    dtype=y.dtype)(y)
        y = _UpConv(d // 4, name="upsample_and_conv2")(y)
        y = jnp.concatenate([y, swin_taps[1]], axis=-1)
        y = nn.Conv(d // 4, (3, 3), padding=((1, 1), (1, 1)), name="conv2",
                    dtype=y.dtype)(y)
        y = _UpConv(d // 8, name="upsample_and_conv3")(y)
        y = jnp.concatenate([y, swin_taps[0]], axis=-1)
        y = nn.Conv(d // 8, (3, 3), padding=((1, 1), (1, 1)), name="conv3",
                    dtype=y.dtype)(y)

        e = self.embed_dim                                  # 96
        y = _UpConv(e // 2, name="upsample_and_conv4")(y)
        y = _UpConv(e // 4, name="upsample_and_conv5")(y)
        y = jnp.concatenate([y, cnn_taps[2]], axis=-1)      # 24+64=88
        c4 = (e // 4 + self.cnn_channels[2]) // 2
        y = nn.Conv(c4, (3, 3), padding=((1, 1), (1, 1)), name="conv4",
                    dtype=y.dtype)(y)
        y = _UpConv(c4 // 2, name="upsample_and_conv6")(y)
        y = jnp.concatenate([y, cnn_taps[1]], axis=-1)      # 22+32=54
        c5 = (c4 // 2 + self.cnn_channels[1]) // 2
        y = nn.Conv(c5, (3, 3), padding=((1, 1), (1, 1)), name="conv5",
                    dtype=y.dtype)(y)
        y = _UpConv(c5 // 2 + 1, name="upsample_and_conv7")(y)  # 27->14
        y = jnp.concatenate([y, cnn_taps[0]], axis=-1)      # 14+16=30
        c6 = (c5 // 2 + 1 + self.cnn_channels[0]) // 2
        y = nn.Conv(c6, (3, 3), padding=((1, 1), (1, 1)), name="conv6",
                    dtype=y.dtype)(y)
        y = _UpConv(self.out_channels, name="upsample_and_conv8")(y)
        return jnp.tanh(y).astype(jnp.float32)


class HybridSwinT_2(nn.Module):
    """CNN /4 front end -> Swin(patch 4) -> deconv decoder
    (reference :684-753 forward, Decoder_hbrid_2 :756-797)."""

    out_channels: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 8
    patch_size: int = 4
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(jnp.dtype(self.dtype))
        h = _CnnStage(32, name="cnn0")(x, train)
        h = _CnnStage(64, name="cnn1")(h, train)

        swin_cfg = SwinConfig(
            img_size=(h.shape[1], h.shape[2]), patch_size=self.patch_size,
            embed_dim=self.embed_dim, depths=tuple(self.depths),
            num_heads=tuple(self.num_heads), window_size=self.window_size,
            qkv_bias=False, dtype=self.dtype)
        feats_full, swin_taps = SwinTransformer(swin_cfg, name="swinT")(
            h, collect="stage_out")
        gh = h.shape[1] // (self.patch_size * 2 ** (len(self.depths) - 1))
        gw = h.shape[2] // (self.patch_size * 2 ** (len(self.depths) - 1))
        root = feats_full.reshape(h.shape[0], gh, gw, -1)

        d = self.embed_dim * 2 ** (len(self.depths) - 1)    # 768
        y = TorchConvTranspose(d // 2, (2, 2), strides=(2, 2), padding=0,
                               name="upsample1", dtype=root.dtype)(root)
        y = jnp.concatenate([y, swin_taps[2]], axis=-1)
        y = nn.Conv(d // 2, (3, 3), padding=((1, 1), (1, 1)), name="conv1",
                    dtype=y.dtype)(y)
        y = TorchConvTranspose(d // 4, (2, 2), strides=(2, 2), padding=0,
                               name="upsample2", dtype=y.dtype)(y)
        y = jnp.concatenate([y, swin_taps[1]], axis=-1)
        y = nn.Conv(d // 4, (3, 3), padding=((1, 1), (1, 1)), name="conv2",
                    dtype=y.dtype)(y)
        y = TorchConvTranspose(d // 8, (2, 2), strides=(2, 2), padding=0,
                               name="upsample3", dtype=y.dtype)(y)
        y = jnp.concatenate([y, swin_taps[0]], axis=-1)
        y = nn.Conv(d // 8, (3, 3), padding=((1, 1), (1, 1)), name="conv3",
                    dtype=y.dtype)(y)

        # log2(patch)+2 final 2x deconvs: patch 4 -> x16 back to input size
        n_final = int(np.log2(self.patch_size)) + 2
        for i in range(n_final):
            out_ch = (self.out_channels if i == n_final - 1 else d // 8)
            y = TorchConvTranspose(out_ch, (2, 2), strides=(2, 2), padding=0,
                                   name=f"final_up{i}", dtype=y.dtype)(y)
        return jnp.tanh(y).astype(jnp.float32)


class ViTBlock(nn.Module):
    """Pre-norm transformer block of the HEMIT Cross_Att
    (reference Transformer/Attention/FeedForward :905-965)."""

    dim: int
    heads: int = 3
    dim_head: int = 32
    mlp_dim: int = 128

    @nn.compact
    def __call__(self, x):
        inner = self.heads * self.dim_head
        y = nn.LayerNorm(epsilon=1e-5, name="attn_norm", dtype=x.dtype)(x)
        qkv = nn.Dense(3 * inner, use_bias=False, name="to_qkv",
                       dtype=x.dtype)(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, n, _ = q.shape

        def heads_of(t):
            return t.reshape(b, n, self.heads, self.dim_head
                             ).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhnd,bhmd->bhnm", heads_of(q), heads_of(k),
                            preferred_element_type=jnp.float32)
        logits = logits / np.sqrt(self.dim_head)
        attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, heads_of(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        # project_out: heads*dim_head != dim for the HEMIT configs
        out = nn.Dense(self.dim, name="to_out", dtype=x.dtype)(out)
        x = x + out
        y = nn.LayerNorm(epsilon=1e-5, name="ff_norm", dtype=x.dtype)(x)
        y = nn.Dense(self.mlp_dim, name="ff_fc1", dtype=x.dtype)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="ff_fc2", dtype=x.dtype)(y)
        return x + y


class CrossAtt(nn.Module):
    """Gated summary-token fusion (reference Cross_Att :968-1005): the Swin
    feature is mean-pooled to one summary token, projected to the U-Net
    dim, prepended to the U-Net tokens, run through one transformer block,
    and gate-blended back into the original feature map."""

    dim_unet: int
    dim_swin: int

    @nn.compact
    def __call__(self, unet_feat, swin_feat):
        b, hu, wu, cu = unet_feat.shape
        gate = nn.sigmoid(
            nn.Conv(cu, (1, 1), name="gate", dtype=unet_feat.dtype)(unet_feat))
        swin_tokens = swin_feat.reshape(b, -1, swin_feat.shape[-1])
        s = nn.LayerNorm(epsilon=1e-5, name="norm_swinT",
                         dtype=swin_tokens.dtype)(swin_tokens)
        s = s.mean(axis=1)                                   # AdaptiveAvgPool1d
        s = nn.Dense(self.dim_unet, name="linear_swinT", dtype=s.dtype)(s)
        tokens = jnp.concatenate(
            [s[:, None], unet_feat.reshape(b, hu * wu, cu)], axis=1)
        tokens = ViTBlock(self.dim_unet, name="transformer_unet")(tokens)
        attended = tokens[:, 1:].reshape(b, hu, wu, cu)
        return gate * attended + (1.0 - gate) * unet_feat


class SwinUnetGenerator(nn.Module):
    """pix2pix-style deep U-Net whose 16/8/4-px skip levels are fused with
    a parallel Swin branch through ``CrossAtt`` (reference :800-902).

    The Swin patch size should be input/32 so the Swin pyramid's
    post-downsample maps land on the same 16/8/4 grids as the U-Net taps
    (factory: patch 32 for 1024-px crops, :84-95).
    """

    out_channels: int = 3
    num_downs: int = 10
    ngf: int = 64
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 64
    patch_size: int = 32
    use_dropout: bool = False
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(jnp.dtype(self.dtype))
        ngf = self.ngf
        skips = []
        tap_idx = []
        h = x
        for i in range(self.num_downs):
            out_ch = min(ngf * 2 ** i, ngf * 8)
            h = nn.Conv(out_ch, (4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), name=f"down{i}",
                        dtype=h.dtype)(h)
            h = nn.leaky_relu(h, 0.2)
            if i != self.num_downs - 1:                      # innermost: no norm
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name=f"down{i}_norm",
                                 dtype=h.dtype)(h)
            skips.append(h)
            if h.shape[1] in (16, 8, 4):
                tap_idx.append(i)
        skips = skips[:-1]
        if len(tap_idx) != 3:
            raise ValueError(
                f"SwinUnetGenerator needs down levels at 16/8/4 px, got taps "
                f"at {tap_idx} for input {x.shape[1]}")

        swin_cfg = SwinConfig(
            img_size=(x.shape[1], x.shape[2]), patch_size=self.patch_size,
            embed_dim=self.embed_dim, depths=tuple(self.depths),
            num_heads=tuple(self.num_heads), window_size=self.window_size,
            qkv_bias=True, dtype=self.dtype)
        _, swin_taps = SwinTransformer(swin_cfg, name="swinT")(
            x, collect="post_downsample")

        for j in range(3):
            skips[tap_idx[j]] = CrossAtt(
                ngf * 8, self.embed_dim * 2 ** (j + 1),
                name=f"cross_att{j}")(skips[tap_idx[j]], swin_taps[j])

        # channel plan per reference channel_configs (:814-826), generalized
        # to num_downs: [in 8g -> 8g] + (n-5) x [16g -> 8g] + the tail.
        configs = ([(ngf * 8, ngf * 8)]
                   + [(ngf * 16, ngf * 8)] * (self.num_downs - 5)
                   + [(ngf * 16, ngf * 4), (ngf * 8, ngf * 2),
                      (ngf * 4, ngf)])
        rev_skips = skips[::-1]
        for i, (_, out_ch) in enumerate(configs):
            h = TorchConvTranspose(out_ch, (4, 4), strides=(2, 2), padding=1,
                                   name=f"up{i}", dtype=h.dtype)(h)
            h = nn.relu(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"up{i}_norm",
                             dtype=h.dtype)(h)
            h = jnp.concatenate([h, rev_skips[i]], axis=-1)
        h = TorchConvTranspose(self.out_channels, (4, 4), strides=(2, 2),
                               padding=1, name="up_final", dtype=h.dtype)(h)
        return jnp.tanh(h).astype(jnp.float32)
