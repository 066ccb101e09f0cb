"""Swin transformer + HEMIT dual-branch model tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mipheivit_tpu.models.hemit import (
    GatedCrossAttention,
    NLayerDiscriminator,
    PixelDiscriminator,
    ResnetGenerator,
    ResnetGeneratorSwinT,
    UnetGenerator,
)
from mipheivit_tpu.models.swin import (
    SwinConfig,
    SwinTransformer,
    _rel_pos_index,
    _shift_attn_mask,
)


def _tiny_swin(img=64, conv_stem=False, lora=0):
    return SwinConfig(img_size=(img, img), patch_size=4, embed_dim=16,
                      depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
                      window_size=4, conv_stem=conv_stem, lora_rank=lora)


def test_rel_pos_index_shape():
    idx = _rel_pos_index(7)
    assert idx.shape == (49, 49)
    assert idx.max() == (2 * 7 - 1) ** 2 - 1
    assert idx[0, 0] == idx[48, 48]  # same relative offset


def test_shift_mask():
    m = _shift_attn_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert set(np.unique(m)) <= {0.0, -100.0}
    # interior window (top-left) has no masking
    assert (m[0] == 0).all()


def test_swin_forward_stages(rng):
    cfg = _tiny_swin()
    model = SwinTransformer(cfg)
    x = jnp.array(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out, feats = model.apply(variables, x)
    assert len(feats) == 4
    # strides 4, 8, 16, 32 with dims 16, 32, 64, 128
    assert feats[0].shape == (2, 16, 16, 16)
    assert feats[3].shape == (2, 2, 2, 128)
    assert out.shape == (2, 2, 2, 128)
    # post-downsample collection (HEMIT tap points)
    _, taps = model.apply(variables, x, collect="post_downsample")
    assert len(taps) == 3
    assert taps[0].shape == (2, 8, 8, 32)


def test_swin_conv_stem_and_lora(rng):
    cfg = _tiny_swin(conv_stem=True, lora=2)
    model = SwinTransformer(cfg)
    x = jnp.array(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out, _ = model.apply(variables, x)
    assert out.shape == (1, 2, 2, 128)
    p = variables["params"]["layers0_blocks0"]["attn"]
    assert "lora_q" in p and "lora_v" in p


def test_gated_cross_attention_topk(rng):
    gca = GatedCrossAttention(cnn_channels=8, num_heads=2, k=5,
                              upsample_factor=1)
    cnn = jnp.array(rng.standard_normal((2, 8, 8, 8)).astype(np.float32))
    swin = jnp.array(rng.standard_normal((2, 4, 4, 16)).astype(np.float32))
    variables = gca.init(jax.random.PRNGKey(0), cnn, swin)
    out = gca.apply(variables, cnn, swin)
    assert out.shape == cnn.shape
    # exactly k positions differ from the input (scatter-back semantics)
    diff = (np.abs(np.asarray(out - cnn)).sum(-1) > 1e-6).sum(axis=(1, 2))
    assert (diff <= 5).all() and (diff > 0).all()


def test_hemit_dual_branch_forward(rng):
    model = ResnetGeneratorSwinT(
        out_channels=3, ngf=8, n_blocks=2,
        swin_cfg=_tiny_swin(img=64).replace() if False else SwinConfig(
            img_size=(64, 64), patch_size=4, embed_dim=16,
            depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8), window_size=4),
        top_k=16)
    x = jnp.array(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 64, 64, 3)
    assert np.abs(np.asarray(out)).max() <= 1.0


def test_pix2pix_zoo(rng):
    x = jnp.array(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    for model in (ResnetGenerator(out_channels=2, ngf=8, n_blocks=2),
                  UnetGenerator(out_channels=2, num_downs=5, ngf=8)):
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, 64, 64, 2)
    for disc in (NLayerDiscriminator(ndf=8, n_layers=2),
                 PixelDiscriminator(ndf=8)):
        variables = disc.init(jax.random.PRNGKey(0), x, train=False)
        out = disc.apply(variables, x, train=False)
        assert out.shape[0] == 1 and out.shape[-1] == 1
