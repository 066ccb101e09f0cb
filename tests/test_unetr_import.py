"""UNETR checkpoint import: key-mapping consistency.

Builds a reference-layout torch-key state dict *from* a flax init by
applying the inverse tensor transforms, then imports it and checks the
round trip is bit-exact against the original flax params. (The individual
conv/deconv/linear transforms are verified against torch elsewhere:
tests/test_ops_resize.py, tests/test_model_parity.py, and the empirical
ConvTranspose flip check documented in import_weights._convT.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mipheivit_tpu.models.unetr import UnetrViT
from mipheivit_tpu.models.vit import ViTConfig
from mipheivit_tpu.models.import_weights import unetr_from_torch
from mipheivit_tpu.train.checkpoints import vit_state_dict


def _inv_conv(k):
    return np.asarray(k).transpose(3, 2, 0, 1)


def _inv_convT(k):
    return np.asarray(k).transpose(2, 3, 0, 1)[:, :, ::-1, ::-1]


def _emit_conv_block(sd, base, p, s):
    sd[f"{base}.block.0.weight"] = _inv_conv(p["conv"]["kernel"])
    sd[f"{base}.block.0.bias"] = np.asarray(p["conv"]["bias"])
    sd[f"{base}.block.1.weight"] = np.asarray(p["bn"]["scale"])
    sd[f"{base}.block.1.bias"] = np.asarray(p["bn"]["bias"])
    sd[f"{base}.block.1.running_mean"] = np.asarray(s["bn"]["mean"])
    sd[f"{base}.block.1.running_var"] = np.asarray(s["bn"]["var"])


def _emit_deconv_block(sd, base, p, s):
    sd[f"{base}.block.0.weight"] = _inv_convT(p["deconv"]["kernel"])
    sd[f"{base}.block.0.bias"] = np.asarray(p["deconv"]["bias"])
    sd[f"{base}.block.1.weight"] = _inv_conv(p["conv"]["kernel"])
    sd[f"{base}.block.1.bias"] = np.asarray(p["conv"]["bias"])
    sd[f"{base}.block.2.weight"] = np.asarray(p["bn"]["scale"])
    sd[f"{base}.block.2.bias"] = np.asarray(p["bn"]["bias"])
    sd[f"{base}.block.2.running_mean"] = np.asarray(s["bn"]["mean"])
    sd[f"{base}.block.2.running_var"] = np.asarray(s["bn"]["var"])


def test_unetr_import_roundtrip(rng):
    cfg = ViTConfig(img_size=(64, 64), patch_size=16, embed_dim=64, depth=4,
                    num_heads=2, mlp_hidden_dim=128, reg_tokens=4,
                    attn_impl="xla", remat=False, lora_rank=2)
    model = UnetrViT(vit_cfg=cfg, out_chans=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    sd = {}
    # encoder: reuse the tested ViT exporter under the unetr prefix
    sd.update(vit_state_dict(params["encoder_vit"], cfg, "encoder.model.",
                             wrap_qkv_lora=True))
    fu = "encoder.feature_upsampler"
    for i in range(2):
        _emit_conv_block(sd, f"{fu}.convsteam.{i}",
                         params["feature_upsampler"][f"convsteam_{i}"],
                         stats["feature_upsampler"][f"convsteam_{i}"])
    for j, n_deconv in ((0, 3), (1, 2), (2, 1)):
        for d in range(n_deconv):
            _emit_deconv_block(sd, f"{fu}.upsampler{j}.{d + 1}",
                               params["feature_upsampler"][f"upsampler{j}_{d}"],
                               stats["feature_upsampler"][f"upsampler{j}_{d}"])
    dp, ds = params["decoder"], stats["decoder"]
    sd["decoder.bottleneck_upsampler.weight"] = _inv_convT(
        dp["bottleneck_upsampler"]["kernel"])
    sd["decoder.bottleneck_upsampler.bias"] = dp["bottleneck_upsampler"]["bias"]
    for stage, n_blocks in (("decoder3", 3), ("decoder2", 2), ("decoder1", 2)):
        for b in range(n_blocks):
            _emit_conv_block(sd, f"decoder.{stage}_upsampler.{b}",
                             dp[f"{stage}_{b}"], ds[f"{stage}_{b}"])
        sd[f"decoder.{stage}_upsampler.{n_blocks}.weight"] = _inv_convT(
            dp[f"{stage}_up"]["kernel"])
        sd[f"decoder.{stage}_upsampler.{n_blocks}.bias"] = dp[f"{stage}_up"]["bias"]
    for b in range(2):
        _emit_conv_block(sd, f"decoder.decoder0_header.{b}",
                         dp[f"decoder0_{b}"], ds[f"decoder0_{b}"])
    sd["decoder.decoder0_header.2.weight"] = _inv_conv(dp["decoder0_out"]["kernel"])
    sd["decoder.decoder0_header.2.bias"] = dp["decoder0_out"]["bias"]
    for k in range(2):
        hp = params[f"segmentation_head_{k}"]
        hs = stats[f"segmentation_head_{k}"]
        base = f"segmentation_head_{k}"
        sd[f"{base}.0.psi.0.weight"] = _inv_conv(hp["attention"]["psi_conv1"]["kernel"])
        sd[f"{base}.0.psi.0.bias"] = hp["attention"]["psi_conv1"]["bias"]
        sd[f"{base}.0.psi.1.weight"] = hp["attention"]["psi_bn"]["scale"]
        sd[f"{base}.0.psi.1.bias"] = hp["attention"]["psi_bn"]["bias"]
        sd[f"{base}.0.psi.1.running_mean"] = hs["attention"]["psi_bn"]["mean"]
        sd[f"{base}.0.psi.1.running_var"] = hs["attention"]["psi_bn"]["var"]
        sd[f"{base}.0.psi.3.weight"] = _inv_conv(hp["attention"]["psi_conv2"]["kernel"])
        sd[f"{base}.0.psi.3.bias"] = hp["attention"]["psi_conv2"]["bias"]
        sd[f"{base}.1.weight"] = _inv_conv(hp["conv"]["kernel"])
        sd[f"{base}.1.bias"] = hp["conv"]["bias"]

    p2, s2 = unetr_from_torch(sd, cfg, out_chans=2)
    jax.tree.map(np.testing.assert_array_equal, params, p2)
    jax.tree.map(np.testing.assert_array_equal, stats, s2)

    # imported variables actually run
    out = model.apply({"params": p2, "batch_stats": s2},
                      jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 2)
