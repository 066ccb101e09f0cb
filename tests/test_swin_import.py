"""Swin checkpoint import: key-mapping consistency + ctranspath adaptation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mipheivit_tpu.models.swin import SwinConfig, SwinTransformer
from mipheivit_tpu.models.import_weights import (
    adapt_checkpoint_ctranspath,
    resize_rel_pos_bias_table,
    swin_params_from_torch,
)


def _inv_t(k):
    return np.asarray(k).T


def _inv_conv(k):
    return np.asarray(k).transpose(3, 2, 0, 1)


def _emit_timm_state(params, stats, cfg):
    sd = {}
    if cfg.conv_stem:
        pe = params["patch_embed"]
        ps = stats["patch_embed"]
        for i, slot in enumerate((0, 3)):
            sd[f"patch_embed.proj.{slot}.weight"] = _inv_conv(pe[f"conv{i}"]["kernel"])
            sd[f"patch_embed.proj.{slot + 1}.weight"] = pe[f"bn{i}"]["scale"]
            sd[f"patch_embed.proj.{slot + 1}.bias"] = pe[f"bn{i}"]["bias"]
            sd[f"patch_embed.proj.{slot + 1}.running_mean"] = ps[f"bn{i}"]["mean"]
            sd[f"patch_embed.proj.{slot + 1}.running_var"] = ps[f"bn{i}"]["var"]
        sd["patch_embed.proj.6.weight"] = _inv_conv(pe["proj"]["kernel"])
        sd["patch_embed.proj.6.bias"] = pe["proj"]["bias"]
        sd["patch_embed.norm.weight"] = pe["norm"]["scale"]
        sd["patch_embed.norm.bias"] = pe["norm"]["bias"]
    else:
        sd["patch_embed.proj.weight"] = _inv_conv(params["patch_embed"]["kernel"])
        sd["patch_embed.proj.bias"] = params["patch_embed"]["bias"]
        sd["patch_embed.norm.weight"] = params["patch_norm"]["scale"]
        sd["patch_embed.norm.bias"] = params["patch_norm"]["bias"]
    for si, depth in enumerate(cfg.depths):
        if si > 0:
            d = params[f"downsample{si}"]
            sd[f"layers.{si}.downsample.norm.weight"] = d["norm"]["scale"]
            sd[f"layers.{si}.downsample.norm.bias"] = d["norm"]["bias"]
            sd[f"layers.{si}.downsample.reduction.weight"] = _inv_t(
                d["reduction"]["kernel"])
        for bi in range(depth):
            blk = params[f"layers{si}_blocks{bi}"]
            base = f"layers.{si}.blocks.{bi}"
            sd[f"{base}.norm1.weight"] = blk["norm1"]["scale"]
            sd[f"{base}.norm1.bias"] = blk["norm1"]["bias"]
            sd[f"{base}.attn.qkv.weight"] = _inv_t(blk["attn"]["qkv"]["kernel"])
            if "bias" in blk["attn"]["qkv"]:   # qkv_bias=False in HEMIT hybrids
                sd[f"{base}.attn.qkv.bias"] = blk["attn"]["qkv"]["bias"]
            sd[f"{base}.attn.proj.weight"] = _inv_t(blk["attn"]["proj"]["kernel"])
            sd[f"{base}.attn.proj.bias"] = blk["attn"]["proj"]["bias"]
            sd[f"{base}.attn.relative_position_bias_table"] = \
                blk["attn"]["relative_position_bias_table"]
            sd[f"{base}.norm2.weight"] = blk["norm2"]["scale"]
            sd[f"{base}.norm2.bias"] = blk["norm2"]["bias"]
            sd[f"{base}.mlp.fc1.weight"] = _inv_t(blk["mlp_fc1"]["kernel"])
            sd[f"{base}.mlp.fc1.bias"] = blk["mlp_fc1"]["bias"]
            sd[f"{base}.mlp.fc2.weight"] = _inv_t(blk["mlp_fc2"]["kernel"])
            sd[f"{base}.mlp.fc2.bias"] = blk["mlp_fc2"]["bias"]
    sd["norm.weight"] = params["norm"]["scale"]
    sd["norm.bias"] = params["norm"]["bias"]
    return {k: np.asarray(v) for k, v in sd.items()}


@pytest.mark.parametrize("conv_stem", [False, True])
def test_swin_import_roundtrip(rng, conv_stem):
    cfg = SwinConfig(img_size=(64, 64), patch_size=4, embed_dim=16,
                     depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
                     window_size=4, conv_stem=conv_stem)
    model = SwinTransformer(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables.get("batch_stats", {}))

    sd = _emit_timm_state(params, stats, cfg)
    p2, s2 = swin_params_from_torch(sd, cfg)
    jax.tree.map(np.testing.assert_array_equal, params, p2)
    if conv_stem:
        jax.tree.map(np.testing.assert_array_equal, stats, s2)
    out, feats = model.apply(
        {"params": p2, "batch_stats": s2}, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 2, 2, 128)


def test_ctranspath_key_shift():
    state = {
        "layers.0.downsample.norm.weight": np.zeros(2),
        "layers.1.downsample.reduction.weight": np.zeros(2),
        "layers.0.blocks.0.attn.relative_position_index": np.zeros(2),
        "layers.0.blocks.0.attn_mask": np.zeros(2),
        "norm.weight": np.zeros(2),
    }
    out = adapt_checkpoint_ctranspath(state)
    assert "layers.1.downsample.norm.weight" in out
    assert "layers.2.downsample.reduction.weight" in out
    assert not any("relative_position_index" in k or "attn_mask" in k
                   for k in out)
    assert "norm.weight" in out


def test_rel_pos_table_resize():
    table = np.random.default_rng(0).standard_normal((13 * 13, 3)).astype(np.float32)
    out = resize_rel_pos_bias_table(table, new_window=4)   # -> (7*7, 3)
    assert out.shape == (49, 3)
    same = resize_rel_pos_bias_table(table, new_window=7)
    np.testing.assert_array_equal(same, table)
