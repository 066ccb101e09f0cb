"""UNETR-style U-Net with foundation-ViT pyramid encoder.

Reference: src/generators/unet.py — ``ViTPyramidEncoder`` takes timm
``forward_intermediates`` at 4 depths (``np.linspace(depth//4, depth-1, 4)``
rounded, unet.py:132-138), ``ViTFeatureUpsampler`` builds a deconv pyramid
plus an RGB conv-stem skip, and a CellViT-style ``Decoder`` fuses them with
ConvTranspose stages; one attention-gated SegmentationHead per marker.
``unet_frozen`` freezes the encoder but keeps the upsampler trainable
(unet.py:69-75); ``unet_lora`` applies LoRA(8, 1.0).

NHWC; intermediates come out of the scanned ViT via per-layer taps.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from .vit import ViTConfig, VisionTransformer
from .foundation import get_encoder_spec
from .mipheivit import SegmentationHead, conv_init, bn_scale_init
from ..ops.resize import resize_nearest


class Conv2DBlock(nn.Module):
    """conv3x3 + BN + ReLU + dropout (reference: unet.py:441-474)."""

    out_channels: int
    kernel_size: int = 3
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        pad = (k - 1) // 2
        x = nn.Conv(self.out_channels, (k, k), padding=((pad, pad), (pad, pad)),
                    kernel_init=conv_init, name="conv", dtype=x.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, scale_init=bn_scale_init,
                         name="bn", dtype=x.dtype)(x)
        x = nn.relu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class Deconv2DBlock(nn.Module):
    """ConvTranspose(k2,s2) + conv3x3 + BN + ReLU + dropout
    (reference: unet.py:477-519)."""

    out_channels: int
    kernel_size: int = 3
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(self.out_channels, (2, 2), strides=(2, 2),
                             padding="VALID", kernel_init=conv_init,
                             name="deconv", dtype=x.dtype)(x)
        k = self.kernel_size
        pad = (k - 1) // 2
        x = nn.Conv(self.out_channels, (k, k), padding=((pad, pad), (pad, pad)),
                    kernel_init=conv_init, name="conv", dtype=x.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, scale_init=bn_scale_init,
                         name="bn", dtype=x.dtype)(x)
        x = nn.relu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


def _nearest_regrid(x, target_hw):
    """nn.Upsample(mode='nearest') parity for the patch-14 -> /16 re-grid
    (reference: unet.py:196-213)."""
    x = x.transpose(0, 3, 1, 2)
    x = resize_nearest(x, target_hw)
    return x.transpose(0, 2, 3, 1)


class ViTFeatureUpsampler(nn.Module):
    """Deconv pyramids over 4 ViT taps + RGB convstream skip
    (reference: unet.py:176-235)."""

    embed_dim: int
    drop_rate: float = 0.0
    target_grid: Optional[Tuple[int, int]] = None  # set when patch != 16

    @nn.compact
    def __call__(self, x_rgb, features, train: bool = False):
        if self.embed_dim < 512:
            skip11, skip12, bottleneck = 256, 128, 312
        else:
            skip11, skip12, bottleneck = 512, 256, 512

        conv_stem = Conv2DBlock(32, 3, self.drop_rate, name="convsteam_0")(
            x_rgb, train)
        conv_stem = Conv2DBlock(64, 3, self.drop_rate, name="convsteam_1")(
            conv_stem, train)

        feats = list(features)
        if self.target_grid is not None:
            feats = [_nearest_regrid(f, self.target_grid) for f in feats]

        f0 = Deconv2DBlock(skip11, 3, self.drop_rate, name="upsampler0_0")(feats[0], train)
        f0 = Deconv2DBlock(skip12, 3, self.drop_rate, name="upsampler0_1")(f0, train)
        f0 = Deconv2DBlock(128, 3, self.drop_rate, name="upsampler0_2")(f0, train)

        f1 = Deconv2DBlock(skip11, 3, self.drop_rate, name="upsampler1_0")(feats[1], train)
        f1 = Deconv2DBlock(256, 3, self.drop_rate, name="upsampler1_1")(f1, train)

        f2 = Deconv2DBlock(bottleneck, 3, self.drop_rate, name="upsampler2_0")(feats[2], train)

        f3 = feats[3]
        return [conv_stem, f0, f1, f2, f3]


class CellViTDecoder(nn.Module):
    """U-Net decoder with ConvTranspose stages (reference: unet.py:288-404).
    Channel plan derives from encoder_out_channels [c0..c4]."""

    encoder_out_channels: Sequence[int]
    out_channels: int = 32
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, features, train: bool = False):
        z0, z1, z2, z3, z4 = features
        c0, c1, c2, c3, c4 = self.encoder_out_channels

        b4 = nn.ConvTranspose(c3, (2, 2), strides=(2, 2), padding="VALID",
                              kernel_init=conv_init,
                              name="bottleneck_upsampler", dtype=z4.dtype)(z4)
        h = jnp.concatenate([z3, b4], axis=-1)
        for j in range(3):
            h = Conv2DBlock(c3, 3, self.drop_rate,
                            name=f"decoder3_{j}")(h, train)
        h = nn.ConvTranspose(c2, (2, 2), strides=(2, 2), padding="VALID",
                             kernel_init=conv_init, name="decoder3_up",
                             dtype=h.dtype)(h)
        h = jnp.concatenate([z2, h], axis=-1)
        for j in range(2):
            h = Conv2DBlock(c2, 3, self.drop_rate,
                            name=f"decoder2_{j}")(h, train)
        h = nn.ConvTranspose(c1, (2, 2), strides=(2, 2), padding="VALID",
                             kernel_init=conv_init, name="decoder2_up",
                             dtype=h.dtype)(h)
        h = jnp.concatenate([z1, h], axis=-1)
        for j in range(2):
            h = Conv2DBlock(c1, 3, self.drop_rate,
                            name=f"decoder1_{j}")(h, train)
        h = nn.ConvTranspose(c0, (2, 2), strides=(2, 2), padding="VALID",
                             kernel_init=conv_init, name="decoder1_up",
                             dtype=h.dtype)(h)
        h = jnp.concatenate([z0, h], axis=-1)
        for j in range(2):
            h = Conv2DBlock(c0, 3, self.drop_rate,
                            name=f"decoder0_{j}")(h, train)
        h = nn.Conv(self.out_channels, (1, 1), kernel_init=conv_init,
                    name="decoder0_out", dtype=h.dtype)(h)
        return h


def extract_layers_for_depth(depth: int):
    """reference: unet.py:132-138."""
    if depth == 4:
        return (0, 1, 2, 3)
    if depth > 4:
        return tuple(int(v) for v in
                     np.round(np.linspace(depth // 4, depth - 1, 4)))
    raise ValueError("ViT should have a depth higher than 3")


class UnetrViT(nn.Module):
    """Full UNETR generator with a ViT pyramid encoder."""

    vit_cfg: ViTConfig
    out_chans: int = 16
    decoder_out_channels: int = 32
    head_use_attention: bool = True
    drop_rate: float = 0.0
    activation: str = "tanh"

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.vit_cfg
        taps = extract_layers_for_depth(cfg.depth)
        vit = VisionTransformer(cfg, intermediates=taps, name="encoder_vit")
        _, inter = vit(x)
        gh, gw = cfg.grid_size
        b = x.shape[0]

        def to_grid(tokens):
            t = tokens[:, cfg.num_prefix_tokens:]
            return t.reshape(b, gh, gw, cfg.embed_dim)

        feats = [to_grid(t) for t in inter]
        target = None
        if cfg.patch_size != 16:
            target = (x.shape[1] // 16, x.shape[2] // 16)
        emb = cfg.embed_dim
        if emb < 512:
            out_channels = (64, 128, 256, 312, emb)
        else:
            out_channels = (64, 128, 256, 512, emb)
        feats = ViTFeatureUpsampler(
            emb, self.drop_rate, target, name="feature_upsampler")(
            x.astype(feats[0].dtype), feats, train)
        h = CellViTDecoder(out_channels, self.decoder_out_channels,
                           self.drop_rate, name="decoder")(feats, train)
        outs = [
            SegmentationHead(self.head_use_attention, self.activation,
                             name=f"segmentation_head_{k}")(h, train)
            for k in range(self.out_chans)
        ]
        return jnp.concatenate(outs, axis=-1).astype(jnp.float32)


class UnetrSwin(nn.Module):
    """UNETR with a Swin encoder (ctranspath). Per-stage single-deconv
    upsamplers (reference: unet.py:238-285 ``SwinViTFeatureUpsampler``)."""

    swin_cfg: object
    out_chans: int = 16
    decoder_out_channels: int = 32
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .swin import SwinTransformer

        _, feats = SwinTransformer(self.swin_cfg, name="model")(x)
        dims = [self.swin_cfg.stage_dim(i) for i in range(4)]
        bottleneck = 312 if dims[-1] < 512 else 512

        stem = Conv2DBlock(32, 3, self.drop_rate, name="convsteam_0")(x, train)
        stem = Conv2DBlock(64, 3, self.drop_rate, name="convsteam_1")(stem, train)
        f0 = Deconv2DBlock(128, 3, self.drop_rate, name="upsampler0_0")(feats[0], train)
        f1 = Deconv2DBlock(256, 3, self.drop_rate, name="upsampler1_0")(feats[1], train)
        f2 = Deconv2DBlock(bottleneck, 3, self.drop_rate, name="upsampler2_0")(feats[2], train)
        f3 = Deconv2DBlock(dims[3], 3, self.drop_rate, name="upsampler3_0")(feats[3], train)
        out_channels = (64, 128, 256, bottleneck, dims[3])
        h = CellViTDecoder(out_channels, self.decoder_out_channels,
                           self.drop_rate, name="decoder")(
            [stem, f0, f1, f2, f3], train)
        outs = [
            SegmentationHead(True, "tanh", name=f"segmentation_head_{k}")(h, train)
            for k in range(self.out_chans)
        ]
        return jnp.concatenate(outs, axis=-1).astype(jnp.float32)


def build_unetr(model_name: str, img_size, nc_in: int, nc_out: int, cfg,
                dtype: str = "float32"):
    encoder_name = "hoptimus0"
    drop = 0.0
    if cfg is not None:
        encoder_name = cfg.select("model.encoder.encoder_name", "hoptimus0")
        drop = float(cfg.select("model.dropout", 0.0) or 0.0)
    spec = get_encoder_spec(encoder_name, img_size)
    if spec.family == "vit":
        use_lora = "lora" in model_name
        vit_cfg = spec.vit_cfg.replace(
            lora_rank=8 if use_lora else 0, lora_alpha=1.0, dtype=dtype)
        return UnetrViT(vit_cfg=vit_cfg, out_chans=nc_out, drop_rate=drop)
    if spec.family == "resnet":
        from .cnn import UnetResnet50

        return UnetResnet50(out_chans=nc_out, drop_rate=drop, dtype=dtype)
    if spec.family == "swin":
        use_lora = "lora" in model_name
        swin_cfg = dataclasses.replace(
            spec.swin_cfg, lora_rank=8 if use_lora else 0, dtype=dtype)
        return UnetrSwin(swin_cfg=swin_cfg, out_chans=nc_out, drop_rate=drop)
    raise NotImplementedError(
        f"unetr encoder family {spec.family!r} ({encoder_name}) not yet built")
