"""CNN encoders (ResNet-50, ConvNeXt) + the UNETR ResNet variant.

Reference uses timm's resnet50 (lunit-SwAV weights) as a UNETR encoder
(reference: src/generators/unet.py:95-113 ``Resnet50LunitSwav``: RGB
conv-stem skip + stem/layer1/layer2/layer3 taps -> channels
[64, 64, 256, 512, 1024]) and ``tu-convnext_large`` as an SMP U-Net
encoder (configs/experiments/models/convnext.yaml). Implemented here
timm-layout-compatible so local checkpoints import; no hub download.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import flax.linen as nn


class _BN(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name="bn", dtype=x.dtype)(x)


class Bottleneck(nn.Module):
    """torchvision/timm ResNet bottleneck (1x1 -> 3x3 -> 1x1, expansion 4)."""

    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name, dtype=h.dtype)(h)

        identity = x
        h = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1",
                    dtype=x.dtype)(x)
        h = nn.relu(bn(h, "bn1"))
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv2",
                    dtype=h.dtype)(h)
        h = nn.relu(bn(h, "bn2"))
        h = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3",
                    dtype=h.dtype)(h)
        h = bn(h, "bn3")
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               name="downsample_conv", dtype=x.dtype)(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    name="downsample_bn",
                                    dtype=identity.dtype)(identity)
        return nn.relu(h + identity)


class ResNet50(nn.Module):
    """ResNet-50 trunk returning stage features
    [stem(64,s2), layer1(256,s4), layer2(512,s8), layer3(1024,s16),
    layer4(2048,s32)] (timm forward_intermediates layout)."""

    num_stages: int = 4  # how many residual stages to run (4 = all)

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1", dtype=x.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1", dtype=h.dtype)(h)
        h = nn.relu(h)
        feats = [h]                                         # stride 2
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        plan = [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]
        for si, (planes, blocks, stride) in enumerate(plan[:self.num_stages]):
            for bi in range(blocks):
                h = Bottleneck(planes, stride if bi == 0 else 1,
                               downsample=bi == 0,
                               name=f"layer{si + 1}_{bi}")(h, train)
            feats.append(h)
        return feats


class ConvNeXtBlock(nn.Module):
    dim: int
    ls_init: float = 1e-6

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.dim, (7, 7), padding=((3, 3), (3, 3)),
                    feature_group_count=self.dim, name="dwconv",
                    dtype=x.dtype)(x)
        h = nn.LayerNorm(epsilon=1e-6, name="norm", dtype=h.dtype)(h)
        h = nn.Dense(4 * self.dim, name="pwconv1", dtype=h.dtype)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="pwconv2", dtype=h.dtype)(h)
        gamma = self.param("gamma", nn.initializers.constant(self.ls_init),
                           (self.dim,))
        return x + h * gamma.astype(h.dtype)


class ConvNeXt(nn.Module):
    """ConvNeXt trunk returning the 4 stage features (strides 4/8/16/32).
    Default dims = convnext_large."""

    dims: Sequence[int] = (192, 384, 768, 1536)
    depths: Sequence[int] = (3, 3, 27, 3)

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        feats = []
        h = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), name="stem_conv",
                    dtype=x.dtype)(x)
        h = nn.LayerNorm(epsilon=1e-6, name="stem_norm", dtype=h.dtype)(h)
        for si, (dim, depth) in enumerate(zip(self.dims, self.depths)):
            if si > 0:
                h = nn.LayerNorm(epsilon=1e-6, name=f"down{si}_norm",
                                 dtype=h.dtype)(h)
                h = nn.Conv(dim, (2, 2), strides=(2, 2),
                            name=f"down{si}_conv", dtype=h.dtype)(h)
            for bi in range(depth):
                h = ConvNeXtBlock(dim, name=f"stage{si}_{bi}")(h)
            feats.append(h)
        return feats


class UnetResnet50(nn.Module):
    """UNETR variant with the lunit-SwAV ResNet-50 encoder
    (reference: unet.py:95-113): conv-stem skip + 4 resnet taps -> CellViT
    decoder -> per-marker attention heads."""

    out_chans: int = 16
    decoder_out_channels: int = 32
    drop_rate: float = 0.0
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .unetr import CellViTDecoder, Conv2DBlock
        from .mipheivit import SegmentationHead

        x = x.astype(jnp.dtype(self.dtype))
        stem = Conv2DBlock(32, 3, self.drop_rate, name="convsteam_0")(x, train)
        stem = Conv2DBlock(64, 3, self.drop_rate, name="convsteam_1")(stem, train)
        feats = ResNet50(num_stages=3, name="model")(x, train)
        features = [stem] + feats  # [64, 64, 256, 512, 1024]
        h = CellViTDecoder((64, 64, 256, 512, 1024),
                           self.decoder_out_channels, self.drop_rate,
                           name="decoder")(features, train)
        outs = [
            SegmentationHead(True, "tanh", name=f"segmentation_head_{k}")(h, train)
            for k in range(self.out_chans)
        ]
        return jnp.concatenate(outs, axis=-1).astype(jnp.float32)
