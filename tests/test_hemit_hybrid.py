"""HEMIT Swin-hybrid zoo: forward shapes + checkpoint import roundtrips.

Covers HybridSwinT (reference src/generators/hemit_models.py:489),
HybridSwinT_2 (:684) and SwinUnetGenerator (:800): each test emits a
synthetic torch-layout state dict from a freshly-initialized flax model,
imports it back, asserts bit-equality of every mapped parameter, and runs
one forward to pin output shape/range.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mipheivit_tpu.models.hemit import build_hemit_netG
from mipheivit_tpu.models.hemit_hybrid import (
    HybridSwinT, HybridSwinT_2, SwinUnetGenerator)
from mipheivit_tpu.models.import_hemit import (
    hybrid_swint_from_torch, hybrid_swint2_from_torch, swin_unet_from_torch)
from mipheivit_tpu.models.swin import SwinConfig

from test_swin_import import _emit_timm_state, _inv_conv, _inv_t


def _inv_convT(k):
    return np.asarray(k).transpose(2, 3, 0, 1)[:, :, ::-1, ::-1]


def _emit_conv(sd, base, p):
    sd[f"{base}.weight"] = _inv_conv(p["kernel"])
    if "bias" in p:
        sd[f"{base}.bias"] = np.asarray(p["bias"])


def _emit_deconv(sd, base, p):
    sd[f"{base}.weight"] = _inv_convT(p["kernel"])
    sd[f"{base}.bias"] = np.asarray(p["bias"])


def _emit_bn(sd, base, p, s):
    sd[f"{base}.weight"] = np.asarray(p["scale"])
    sd[f"{base}.bias"] = np.asarray(p["bias"])
    sd[f"{base}.running_mean"] = np.asarray(s["mean"])
    sd[f"{base}.running_var"] = np.asarray(s["var"])


def _emit_ln(sd, base, p):
    sd[f"{base}.weight"] = np.asarray(p["scale"])
    sd[f"{base}.bias"] = np.asarray(p["bias"])


def _emit_dense(sd, base, p, bias=True):
    sd[f"{base}.weight"] = _inv_t(p["kernel"])
    if bias and "bias" in p:
        sd[f"{base}.bias"] = np.asarray(p["bias"])


def _assert_trees_equal(a, b):
    jax.tree.map(np.testing.assert_array_equal, a, b)


def test_hybrid_swint_roundtrip():
    model = HybridSwinT(out_channels=4, cnn_channels=(8, 16, 32),
                        embed_dim=16, depths=(1, 1, 1, 1),
                        num_heads=(1, 2, 4, 8), window_size=4)
    x = jnp.zeros((1, 256, 256, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    sd = {}
    for i in range(3):
        _emit_conv(sd, f"cnn_block.{4 * i}", params[f"cnn{i}"]["conv"])
        _emit_bn(sd, f"cnn_block.{4 * i + 1}", params[f"cnn{i}"]["bn"],
                 stats[f"cnn{i}"]["bn"])
    swin_cfg = SwinConfig(img_size=(32, 32), patch_size=4, embed_dim=16,
                          depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                          window_size=4, qkv_bias=False)
    swin_sd = _emit_timm_state(params["swinT"], {}, swin_cfg)
    sd.update({f"model.{k}": v for k, v in swin_sd.items()})
    for k in range(1, 9):
        _emit_conv(sd, f"decoder.upsample_and_conv{k}.1",
                   params[f"upsample_and_conv{k}"]["conv"])
    for k in range(1, 7):
        _emit_conv(sd, f"decoder.conv{k}", params[f"conv{k}"])

    p2, s2 = hybrid_swint_from_torch(sd, model, (256, 256))
    _assert_trees_equal(params, p2)
    _assert_trees_equal(stats, s2)
    out = model.apply({"params": p2, "batch_stats": s2}, x, train=False)
    assert out.shape == (1, 256, 256, 4)
    assert float(jnp.max(jnp.abs(out))) <= 1.0


def test_hybrid_swint2_roundtrip():
    model = HybridSwinT_2(out_channels=5, embed_dim=16, depths=(1, 1, 2, 1),
                          num_heads=(1, 2, 4, 8), window_size=4)
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    sd = {}
    for i, slot in enumerate((0, 4)):
        _emit_conv(sd, f"cnn_block.{slot}", params[f"cnn{i}"]["conv"])
        _emit_bn(sd, f"cnn_block.{slot + 1}", params[f"cnn{i}"]["bn"],
                 stats[f"cnn{i}"]["bn"])
    swin_cfg = SwinConfig(img_size=(32, 32), patch_size=4, embed_dim=16,
                          depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
                          window_size=4, qkv_bias=False)
    swin_sd = _emit_timm_state(params["swinT"], {}, swin_cfg)
    sd.update({f"model.{k}": v for k, v in swin_sd.items()})
    for k in range(1, 4):
        _emit_deconv(sd, f"decoder.upsample{k}", params[f"upsample{k}"])
        _emit_conv(sd, f"decoder.conv{k}", params[f"conv{k}"])
    for i in range(4):
        _emit_deconv(sd, f"decoder.final_upsample_layers.{i}",
                     params[f"final_up{i}"])

    p2, s2 = hybrid_swint2_from_torch(sd, model, (128, 128))
    _assert_trees_equal(params, p2)
    _assert_trees_equal(stats, s2)
    out = model.apply({"params": p2, "batch_stats": s2}, x, train=False)
    assert out.shape == (1, 128, 128, 5)


def test_swin_unet_roundtrip():
    model = SwinUnetGenerator(out_channels=4, num_downs=8, ngf=8,
                              embed_dim=16, depths=(1, 1, 2, 1),
                              num_heads=(1, 2, 4, 8), window_size=8,
                              patch_size=8)
    x = jnp.zeros((1, 256, 256, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    sd = {}
    for i in range(8):
        _emit_conv(sd, f"down_layers.{i}.0", params[f"down{i}"])
        if i != 7:
            _emit_bn(sd, f"down_layers.{i}.2", params[f"down{i}_norm"],
                     stats[f"down{i}_norm"])
    swin_cfg = SwinConfig(img_size=(256, 256), patch_size=8, embed_dim=16,
                          depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
                          window_size=8, qkv_bias=True)
    swin_sd = _emit_timm_state(params["swinT"], {}, swin_cfg)
    sd.update({f"swinT.{k}": v for k, v in swin_sd.items()})
    for j in range(3):
        base = f"cross_atts.{j}"
        ca = params[f"cross_att{j}"]
        _emit_conv(sd, f"{base}.gate.0", ca["gate"])
        _emit_ln(sd, f"{base}.norm_swinT", ca["norm_swinT"])
        _emit_dense(sd, f"{base}.linear_swinT", ca["linear_swinT"])
        tu = ca["transformer_unet"]
        _emit_ln(sd, f"{base}.transformer_unet.layers.0.0.norm",
                 tu["attn_norm"])
        _emit_dense(sd, f"{base}.transformer_unet.layers.0.0.fn.to_qkv",
                    tu["to_qkv"], bias=False)
        _emit_dense(sd, f"{base}.transformer_unet.layers.0.0.fn.to_out.0",
                    tu["to_out"])
        _emit_ln(sd, f"{base}.transformer_unet.layers.0.1.norm",
                 tu["ff_norm"])
        _emit_dense(sd, f"{base}.transformer_unet.layers.0.1.fn.net.0",
                    tu["ff_fc1"])
        _emit_dense(sd, f"{base}.transformer_unet.layers.0.1.fn.net.3",
                    tu["ff_fc2"])
    for i in range(7):
        _emit_deconv(sd, f"up_layers.{i}.0", params[f"up{i}"])
        _emit_bn(sd, f"up_layers.{i}.2", params[f"up{i}_norm"],
                 stats[f"up{i}_norm"])
    _emit_deconv(sd, "final_layer.0", params["up_final"])

    p2, s2 = swin_unet_from_torch(sd, model, (256, 256))
    _assert_trees_equal(params, p2)
    _assert_trees_equal(stats, s2)
    out = model.apply({"params": p2, "batch_stats": s2}, x, train=False)
    assert out.shape == (1, 256, 256, 4)


def test_build_hemit_netg_dispatch():
    m = build_hemit_netG("swinT", 256, 3, 4)
    assert isinstance(m, HybridSwinT)
    m = build_hemit_netG("swinT_old", 256, 3, 4)
    assert isinstance(m, HybridSwinT_2)
    m = build_hemit_netG("SwinTUnet", 1024, 3, 4)
    assert isinstance(m, SwinUnetGenerator)
    assert m.num_downs == 10 and m.patch_size == 32
    with pytest.raises(NotImplementedError):
        build_hemit_netG("nope", 256, 3, 4)


def test_build_hemit_netg_use_dropout_plumbed():
    """use_dropout reaches the resnet/unet generators (reference
    get_generator_hemit forwards it — ADVICE r3 low): train-mode applies
    with different dropout rngs differ, eval mode is deterministic."""
    import jax
    import jax.numpy as jnp

    for netG in ("resnet_6blocks", "unet_128"):
        m = m_drop = build_hemit_netG(netG, 128, 3, 4, use_dropout=True)
        assert m_drop.use_dropout
        x = jnp.ones((1, 128, 128, 3), jnp.float32)
        v = m.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x, train=True)
        outs = [m.apply(v, x, train=True,
                        rngs={"dropout": jax.random.PRNGKey(k)},
                        mutable=["batch_stats"])[0] for k in (2, 3)]
        assert not jnp.allclose(outs[0], outs[1])
        e1 = m.apply(v, x, train=False)
        e2 = m.apply(v, x, train=False)
        assert jnp.allclose(e1, e2)
        # param tree is unchanged by dropout (no new params)
        m_plain = build_hemit_netG(netG, 128, 3, 4, use_dropout=False)
        v_plain = m_plain.init(jax.random.PRNGKey(0), x, train=False)
        assert (jax.tree_util.tree_structure(v_plain["params"])
                == jax.tree_util.tree_structure(v["params"]))
