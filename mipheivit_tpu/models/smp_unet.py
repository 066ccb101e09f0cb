"""SMP-style multi-head U-Net (ConvNeXt / ResNet encoders).

Reference: src/generators/smp_unet.py — segmentation_models_pytorch U-Net
with ``InterpDecoderBlock`` (nearest x2 upsample + 2x Conv-BN-ReLU,
smp_unet.py:13-50), decoder channels (256, 128, 64, 32, 16), one
attention-gated SegmentationHead per marker (``UnetMultiHeads:264``) and an
optional shared-decoder foreground head (``UnetMultiHeadsFG:345``).

Encoders: ``resnet50`` gives the classic 5-feature pyramid
(input, stem 64, 256, 512, 1024/2048); ``tu-convnext_large`` has 4 stages
(strides 4..32), so the decoder runs 4 blocks and the final x4 is covered
by the last two interp blocks upsampling past the stem — mirroring how
smp's TimmUniversalEncoder pads missing strides with identity features.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from .cnn import ConvNeXt, ResNet50
from .mipheivit import SegmentationHead, conv_init, bn_scale_init


class Conv2dReLU(nn.Module):
    out_channels: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=conv_init, name="conv",
                    dtype=x.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, scale_init=bn_scale_init, name="bn",
                         dtype=x.dtype)(x)
        x = nn.relu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class InterpDecoderBlock(nn.Module):
    """nearest x2 -> concat skip -> conv-BN-ReLU x2
    (reference: smp_unet.py:13-50)."""

    out_channels: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest x2
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        x = Conv2dReLU(self.out_channels, self.dropout, name="conv1")(x, train)
        x = Conv2dReLU(self.out_channels, name="conv2")(x, train)
        return x


class UnetMultiHeads(nn.Module):
    """Multi-head SMP U-Net; ``foreground_head=True`` adds the shared-decoder
    FG head (UnetMultiHeadsFG parity — returns (masks, fg_logits))."""

    encoder_name: str = "resnet50"
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    out_chans: int = 16
    dropout: float = 0.0
    foreground_head: bool = False
    head_use_attention: bool = True
    activation: str = "tanh"
    dtype: str = "float32"
    # convnext trunk size override (None -> convnext_large); import/oracle
    # tests use a tiny trunk
    encoder_dims: Sequence[int] = None
    encoder_depths: Sequence[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(jnp.dtype(self.dtype))
        if self.encoder_name.startswith("resnet"):
            feats = ResNet50(num_stages=4, name="encoder")(x, train)
            features = [x] + feats   # [in, 64, 256, 512, 1024, 2048]
        elif "convnext" in self.encoder_name:
            kw = {}
            if self.encoder_dims is not None:
                kw = {"dims": tuple(self.encoder_dims),
                      "depths": tuple(self.encoder_depths)}
            feats = ConvNeXt(name="encoder", **kw)(x, train)
            features = [x] + feats   # strides 1, 4, 8, 16, 32
        else:
            raise NotImplementedError(self.encoder_name)

        # smp decoder walk: drop the stride-1 input, reverse, head + skips.
        # Both encoder families put the head at stride 32, so all 5 decoder
        # blocks run; trailing blocks past the skip list upsample skip-less.
        skips = features[1:][::-1]
        h = skips[0]
        skips = skips[1:]
        for i in range(len(self.decoder_channels)):
            skip = skips[i] if i < len(skips) else None
            drop = self.dropout if i in (1, 2) else 0.0
            h = InterpDecoderBlock(self.decoder_channels[i], drop,
                                   name=f"decoder_block_{i}")(h, skip, train)

        outs = [
            SegmentationHead(self.head_use_attention, self.activation,
                             name=f"segmentation_head_{k}")(h, train)
            for k in range(self.out_chans)
        ]
        masks = jnp.concatenate(outs, axis=-1).astype(jnp.float32)
        if self.foreground_head:
            # FG head: one logit map per marker, no attention, no activation
            # (reference: smp_unet.py:368-377 + unet.py SegmentationHead)
            fg = SegmentationHead(False, "none", self.out_chans,
                                  name="foreground_head")(h, train)
            return masks, fg.astype(jnp.float32)
        return masks


def build_smp_unet(model_name: str, img_size, nc_in: int, nc_out: int, cfg,
                   dtype: str = "float32"):
    encoder_name = "resnet50"
    drop = 0.0
    fg = False
    if cfg is not None:
        encoder_name = cfg.select("model.encoder.encoder_name", "resnet50")
        drop = float(cfg.select("model.dropout", 0.0) or 0.0)
        fg = bool(cfg.select("train.foreground_head", False))
    return UnetMultiHeads(encoder_name=encoder_name, out_chans=nc_out,
                          dropout=drop, foreground_head=fg, dtype=dtype)
