"""smp UnetMultiHeads (tu-convnext) checkpoint import: key-for-key
roundtrip (like the Swin oracle test) + torch compute parity for the
ConvNeXt block (VERDICT r1 #8; reference: src/generators/smp_unet.py,
configs/default_configs/convnext.yaml:19)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mipheivit_tpu.models.cnn import ConvNeXtBlock
from mipheivit_tpu.models.smp_unet import UnetMultiHeads
from mipheivit_tpu.models.import_weights import smp_unet_from_torch

DIMS = (8, 16, 24, 32)
DEPTHS = (1, 1, 2, 1)


def _inv_conv(k):
    return np.ascontiguousarray(np.asarray(k).transpose(3, 2, 0, 1))


def _emit_conv(sd, base, p, bias=True):
    sd[f"{base}.weight"] = _inv_conv(p["kernel"])
    if bias and "bias" in p:
        sd[f"{base}.bias"] = np.asarray(p["bias"])


def _emit_ln(sd, base, p):
    sd[f"{base}.weight"] = np.asarray(p["scale"])
    sd[f"{base}.bias"] = np.asarray(p["bias"])


def _emit_bn(sd, base, p, s):
    sd[f"{base}.weight"] = np.asarray(p["scale"])
    sd[f"{base}.bias"] = np.asarray(p["bias"])
    sd[f"{base}.running_mean"] = np.asarray(s["mean"])
    sd[f"{base}.running_var"] = np.asarray(s["var"])


def _emit_dense(sd, base, p):
    sd[f"{base}.weight"] = np.ascontiguousarray(np.asarray(p["kernel"]).T)
    sd[f"{base}.bias"] = np.asarray(p["bias"])


def _emit_smp_state(params, stats, out_chans, fg=False):
    """Inverse of smp_unet_from_torch: synthesizes the torch checkpoint
    layout (timm FeatureListNet-flattened convnext under encoder.model.,
    decoder.blocks conv1/conv2, attention-gated heads)."""
    sd = {}
    enc = params["encoder"]
    _emit_conv(sd, "encoder.model.stem.0", enc["stem_conv"])
    _emit_ln(sd, "encoder.model.stem.1", enc["stem_norm"])
    for s in range(4):
        sp = f"encoder.model.stages_{s}"
        if s > 0:
            _emit_ln(sd, f"{sp}.downsample.0", enc[f"down{s}_norm"])
            _emit_conv(sd, f"{sp}.downsample.1", enc[f"down{s}_conv"])
        for b in range(DEPTHS[s]):
            blk = enc[f"stage{s}_{b}"]
            bp = f"{sp}.blocks.{b}"
            _emit_conv(sd, f"{bp}.conv_dw", blk["dwconv"])
            _emit_ln(sd, f"{bp}.norm", blk["norm"])
            _emit_dense(sd, f"{bp}.mlp.fc1", blk["pwconv1"])
            _emit_dense(sd, f"{bp}.mlp.fc2", blk["pwconv2"])
            sd[f"{bp}.gamma"] = np.asarray(blk["gamma"])
    for i in range(5):
        base = f"decoder.blocks.{i}"
        blk = params[f"decoder_block_{i}"]
        bst = stats[f"decoder_block_{i}"]
        for name in ("conv1", "conv2"):
            _emit_conv(sd, f"{base}.{name}.0", blk[name]["conv"], bias=False)
            _emit_bn(sd, f"{base}.{name}.1", blk[name]["bn"],
                     bst[name]["bn"])
    heads = [f"segmentation_head_{k}" for k in range(out_chans)]
    if fg:
        heads.append("foreground_head")
    for name in heads:
        hp = params[name]
        if "attention" in hp:
            att = hp["attention"]
            _emit_conv(sd, f"{name}.0.psi.0", att["psi_conv1"])
            _emit_bn(sd, f"{name}.0.psi.1", att["psi_bn"],
                     stats[name]["attention"]["psi_bn"])
            _emit_conv(sd, f"{name}.0.psi.3", att["psi_conv2"])
        _emit_conv(sd, f"{name}.1", hp["conv"])
    return sd


@pytest.mark.parametrize("fg", [False, True])
def test_smp_convnext_import_roundtrip(fg):
    model = UnetMultiHeads(encoder_name="tu-convnext_large", out_chans=2,
                           decoder_channels=(16, 8, 8, 8, 8),
                           encoder_dims=DIMS, encoder_depths=DEPTHS,
                           foreground_head=fg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    sd = _emit_smp_state(params, stats, out_chans=2, fg=fg)
    p2, s2 = smp_unet_from_torch(sd)
    jax.tree.map(np.testing.assert_array_equal, params, p2)
    jax.tree.map(np.testing.assert_array_equal, stats, s2)
    out = model.apply({"params": p2, "batch_stats": s2},
                      jnp.zeros((1, 64, 64, 3)), train=False)
    if fg:
        assert out[0].shape == (1, 64, 64, 2)
        assert out[1].shape == (1, 64, 64, 2)
    else:
        assert out.shape == (1, 64, 64, 2)


def test_convnext_block_torch_parity(rng):
    """Compute parity of the ConvNeXt block against torch primitives with
    imported weights (dwconv k7 groups=C + LN + fc1 + exact gelu + fc2 +
    layer scale, residual)."""
    torch = pytest.importorskip("torch")
    dim = 12
    x = rng.standard_normal((2, 9, 9, dim)).astype(np.float32)
    block = ConvNeXtBlock(dim)
    variables = block.init(jax.random.PRNGKey(1), jnp.asarray(x))
    p = jax.tree.map(np.asarray, variables["params"])
    got = np.asarray(block.apply(variables, jnp.asarray(x)))

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    w_dw = torch.from_numpy(_inv_conv(p["dwconv"]["kernel"]))
    h = torch.nn.functional.conv2d(tx, w_dw,
                                   torch.from_numpy(p["dwconv"]["bias"]),
                                   padding=3, groups=dim)
    h = h.permute(0, 2, 3, 1)
    h = torch.nn.functional.layer_norm(
        h, (dim,), torch.from_numpy(p["norm"]["scale"]),
        torch.from_numpy(p["norm"]["bias"]), eps=1e-6)
    h = torch.nn.functional.linear(
        h, torch.from_numpy(np.asarray(p["pwconv1"]["kernel"]).T.copy()),
        torch.from_numpy(p["pwconv1"]["bias"]))
    h = torch.nn.functional.gelu(h)
    h = torch.nn.functional.linear(
        h, torch.from_numpy(np.asarray(p["pwconv2"]["kernel"]).T.copy()),
        torch.from_numpy(p["pwconv2"]["bias"]))
    ref = (torch.from_numpy(x) + h * torch.from_numpy(p["gamma"])).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5)
