"""Model zoo smoke + structure tests (UNETR, ResNet/ConvNeXt U-Nets)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mipheivit_tpu.config import Config
from mipheivit_tpu.models import get_generator
from mipheivit_tpu.models.unetr import UnetrViT, extract_layers_for_depth
from mipheivit_tpu.models.vit import ViTConfig, VisionTransformer


def _cfg(model_name, encoder, fg=False, dropout=0.0):
    return Config.create({
        "model": {"model_name": model_name, "dropout": dropout,
                  "encoder": {"encoder_name": encoder,
                              "encoder_weights": None}},
        "train": {"foreground_head": fg},
    })


def test_extract_layers():
    assert extract_layers_for_depth(40) == (10, 20, 29, 39)
    # exact reference formula check
    assert extract_layers_for_depth(12) == tuple(
        int(v) for v in np.round(np.linspace(3, 11, 4)))
    assert extract_layers_for_depth(4) == (0, 1, 2, 3)


def test_vit_intermediates(rng):
    cfg = ViTConfig(img_size=(32, 32), patch_size=4, embed_dim=32, depth=4,
                    num_heads=2, mlp_hidden_dim=64, reg_tokens=2,
                    attn_impl="xla", remat=False)
    model = VisionTransformer(cfg, intermediates=(1, 3))
    x = jnp.array(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out, inter = model.apply(variables, x)
    assert len(inter) == 2
    assert inter[0].shape == (2, 3 + 64, 32)
    # param layout identical to the no-intermediates module (shared ckpts)
    plain = VisionTransformer(cfg).init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(plain) == jax.tree.structure(variables)


def test_unetr_vit_forward(rng):
    vit_cfg = ViTConfig(img_size=(64, 64), patch_size=16, embed_dim=64,
                        depth=4, num_heads=2, mlp_hidden_dim=128,
                        reg_tokens=4, attn_impl="xla", remat=False,
                        lora_rank=4)
    model = UnetrViT(vit_cfg=vit_cfg, out_chans=5)
    x = jnp.array(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 64, 64, 5)
    assert np.abs(np.asarray(out)).max() <= 1.0  # tanh
    # LoRA params exist under the scanned encoder
    assert "lora_q" in variables["params"]["encoder_vit"]["blocks"]["attn"]


def test_unetr_patch14_regrid(rng):
    """patch-14-style grid (non-/16) goes through the nearest re-grid."""
    # img must be /16-divisible (reference asserts img_size % 16 == 0);
    # 112px with patch 14 -> grid 8x8, /16 target grid 7x7
    vit_cfg = ViTConfig(img_size=(112, 112), patch_size=14, embed_dim=64,
                        depth=4, num_heads=2, mlp_hidden_dim=128,
                        reg_tokens=0, class_token=True, no_embed_class=False,
                        attn_impl="xla", remat=False)
    model = UnetrViT(vit_cfg=vit_cfg, out_chans=2)
    x = jnp.array(rng.standard_normal((1, 112, 112, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 112, 112, 2)


def test_smp_unet_resnet_forward(rng):
    cfg = _cfg("smp_unet", "resnet50")
    model = get_generator("smp_unet", 64, 3, 4, cfg)
    x = jnp.array(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 64, 64, 4)


def test_smp_unet_convnext_forward(rng):
    """ConvNeXt encoder path with a test-sized trunk (same structure)."""
    import flax.linen as nn

    from mipheivit_tpu.models import smp_unet as m
    from mipheivit_tpu.models.cnn import ConvNeXt

    class TinyConvNeXtUnet(m.UnetMultiHeads):
        @nn.compact
        def __call__(self, x, train: bool = False):
            feats = ConvNeXt(dims=(16, 32, 64, 128), depths=(1, 1, 2, 1),
                             name="encoder")(x, train)
            features = [x] + feats
            skips = features[1:][::-1]
            h = skips[0]
            skips = skips[1:]
            for i in range(len(self.decoder_channels)):
                skip = skips[i] if i < len(skips) else None
                h = m.InterpDecoderBlock(self.decoder_channels[i],
                                         name=f"decoder_block_{i}")(h, skip, train)
            from mipheivit_tpu.models.mipheivit import SegmentationHead

            outs = [SegmentationHead(True, "tanh",
                                     name=f"segmentation_head_{k}")(h, train)
                    for k in range(self.out_chans)]
            return jnp.concatenate(outs, axis=-1)

    model = TinyConvNeXtUnet(encoder_name="convnext", out_chans=4)
    x = jnp.array(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 64, 64, 4)


def test_smp_unet_foreground_head(rng):
    cfg = _cfg("smp_unet", "resnet50", fg=True)
    model = get_generator("smp_unet", 64, 3, 4, cfg)
    x = jnp.array(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    masks, fg = model.apply(variables, x, train=False)
    assert masks.shape == (1, 64, 64, 4)
    assert fg.shape == (1, 64, 64, 4)


def test_unetr_resnet50(rng):
    cfg = _cfg("unet", "restnet50_lunit_swav")
    model = get_generator("unet", 64, 3, 3, cfg)
    x = jnp.array(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 64, 64, 3)
