"""HEMIT-codebase checkpoint import (ResnetGeneratorSwinT).

Reference: evaluation/eval_orion_hemit_pipeline.py:25-72 evaluates
checkpoints trained in the original HEMIT repo: timm-Swin key surgery
(old-timm downsample shift, buffer drop, patch-embed/rel-pos resample) plus
the pix2pix Sequential layouts of the CNN branch. This module maps that
state dict onto models.hemit.ResnetGeneratorSwinT:

  initial_layers.{1 conv, 2 bn} -> initial_conv/initial_norm
  downsampling_layers.{i}.{0, 1} -> down{i}_conv/down{i}_norm
  resnet_blocks.{i}.conv_block.{1,2,5,6} -> res{i}.{conv1,n1,conv2,n2}
  swinT.* (timm swin) -> swinT (via swin_params_from_torch)
  cross_atts.{i}.* -> cross_att{i} (torch MultiheadAttention packed
    in_proj split into q/k/v Dense)
  upsampling_layers.{i}.{0 deconv, 1 bn} -> up{i}_deconv/up{i}_norm
  final_layers.1 -> final_conv
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from .import_weights import (
    _conv,
    _convT,
    _t,
    adapt_checkpoint_ctranspath,
    generator_state_dict,
    swin_params_from_torch,
)


def _bn_pair(state, base):
    p = {"scale": np.asarray(state[f"{base}.weight"]),
         "bias": np.asarray(state[f"{base}.bias"])}
    s = {"mean": np.asarray(state[f"{base}.running_mean"]),
         "var": np.asarray(state[f"{base}.running_var"])}
    return p, s


def _conv_p(state, base, bias=True):
    p = {"kernel": _conv(np.asarray(state[f"{base}.weight"]))}
    if bias and f"{base}.bias" in state:
        p["bias"] = np.asarray(state[f"{base}.bias"])
    return p


def _gca_from_torch(state, base: str, n_up: int) -> Dict:
    p: Dict = {"swinT_transform": _conv_p(state, f"{base}.swinT_transform")}
    w = np.asarray(state[f"{base}.attention.in_proj_weight"])
    b = np.asarray(state[f"{base}.attention.in_proj_bias"])
    c = w.shape[1]
    p["attn_q"] = {"kernel": _t(w[:c]), "bias": b[:c]}
    p["attn_k"] = {"kernel": _t(w[c:2 * c]), "bias": b[c:2 * c]}
    p["attn_v"] = {"kernel": _t(w[2 * c:]), "bias": b[2 * c:]}
    p["attn_out"] = {
        "kernel": _t(np.asarray(state[f"{base}.attention.out_proj.weight"])),
        "bias": np.asarray(state[f"{base}.attention.out_proj.bias"])}
    p["gate"] = _conv_p(state, f"{base}.gate.0")
    for i in range(n_up):
        p[f"up{i}_deconv"] = {
            "kernel": _convT(np.asarray(
                state[f"{base}.upsample_blocks.{i}.0.weight"])),
            "bias": np.asarray(state[f"{base}.upsample_blocks.{i}.0.bias"])}
        p[f"up{i}_conv"] = _conv_p(state, f"{base}.upsample_blocks.{i}.2")
    return p


def hemit_swint_from_torch(state: Dict[str, np.ndarray], model,
                           old_timm_layout: bool = False
                           ) -> Tuple[Dict, Dict]:
    """-> (params, batch_stats) for ``ResnetGeneratorSwinT``."""
    state = generator_state_dict(state)
    if old_timm_layout:
        swin_state = {k[len("swinT."):]: v for k, v in state.items()
                      if k.startswith("swinT.")}
        swin_state = adapt_checkpoint_ctranspath(swin_state)
        state = {**{k: v for k, v in state.items()
                    if not k.startswith("swinT.")},
                 **{f"swinT.{k}": v for k, v in swin_state.items()}}

    params: Dict = {}
    stats: Dict = {}

    params["initial_conv"] = _conv_p(state, "initial_layers.1")
    params["initial_norm"] = {}
    bp, bs = _bn_pair(state, "initial_layers.2")
    params["initial_norm"]["norm"] = bp
    stats["initial_norm"] = {"norm": bs}

    for i in range(3):
        params[f"down{i}_conv"] = _conv_p(state, f"downsampling_layers.{i}.0")
        bp, bs = _bn_pair(state, f"downsampling_layers.{i}.1")
        params[f"down{i}_norm"] = {"norm": bp}
        stats[f"down{i}_norm"] = {"norm": bs}

    n_blocks = model.n_blocks
    for i in range(n_blocks):
        base = f"resnet_blocks.{i}.conv_block"
        blk = {"conv1": _conv_p(state, f"{base}.1"),
               "conv2": _conv_p(state, f"{base}.5")}
        bp1, bs1 = _bn_pair(state, f"{base}.2")
        bp2, bs2 = _bn_pair(state, f"{base}.6")
        blk["n1"] = {"norm": bp1}
        blk["n2"] = {"norm": bp2}
        params[f"res{i}"] = blk
        stats[f"res{i}"] = {"n1": {"norm": bs1}, "n2": {"norm": bs2}}

    swin_cfg = model.swin_cfg
    sp, ss = swin_params_from_torch(state, swin_cfg, prefix="swinT.")
    params["swinT"] = sp
    if ss:
        stats["swinT"] = ss

    n_up = int(np.log2(swin_cfg.patch_size))
    for i in range(3):
        params[f"cross_att{i}"] = _gca_from_torch(state, f"cross_atts.{i}",
                                                  n_up)

    for i in range(3):
        params[f"up{i}_deconv"] = {
            "kernel": _convT(np.asarray(state[f"upsampling_layers.{i}.0.weight"])),
            "bias": np.asarray(state[f"upsampling_layers.{i}.0.bias"])}
        bp, bs = _bn_pair(state, f"upsampling_layers.{i}.1")
        params[f"up{i}_norm"] = {"norm": bp}
        stats[f"up{i}_norm"] = {"norm": bs}

    params["final_conv"] = _conv_p(state, "final_layers.1")
    return params, stats


# ---------------------------------------------------------------------------
# The three Swin-hybrid baselines (models.hemit_hybrid) — torch layouts per
# reference src/generators/hemit_models.py:489 (HybridSwinT), :684
# (HybridSwinT_2), :800 (SwinUnetGenerator).


def _swin_branch(state, swin_cfg, torch_prefix: str):
    sub = {k[len(torch_prefix):]: v for k, v in state.items()
           if k.startswith(torch_prefix)}
    return swin_params_from_torch(sub, swin_cfg)


def _cnn_stage(state, conv_key: str, bn_key: str):
    p = {"conv": _conv_p(state, conv_key)}
    bp, bs = _bn_pair(state, bn_key)
    p["bn"] = bp
    return p, {"bn": bs}


def hybrid_swint_from_torch(state, model, img_size) -> Tuple[Dict, Dict]:
    """-> (params, batch_stats) for ``hemit_hybrid.HybridSwinT``.

    torch layout: cnn_block.{4i conv, 4i+1 bn} per stage (conv/bn/relu/pool
    Sequential), ``model.*`` timm Swin, ``decoder.upsample_and_conv{k}.1``
    (conv inside Sequential(Upsample, Conv)) and ``decoder.conv{1..6}``."""
    state = generator_state_dict(state)
    params: Dict = {}
    stats: Dict = {}
    for i in range(len(model.cnn_channels)):
        p, s = _cnn_stage(state, f"cnn_block.{4 * i}", f"cnn_block.{4 * i + 1}")
        params[f"cnn{i}"] = p
        stats[f"cnn{i}"] = s

    from .swin import SwinConfig

    post_cnn = (img_size[0] // 2 ** len(model.cnn_channels),
                img_size[1] // 2 ** len(model.cnn_channels))
    swin_cfg = SwinConfig(
        img_size=post_cnn, patch_size=model.patch_size,
        embed_dim=model.embed_dim, depths=tuple(model.depths),
        num_heads=tuple(model.num_heads), window_size=model.window_size,
        qkv_bias=False)
    params["swinT"], sstats = _swin_branch(state, swin_cfg, "model.")
    if sstats:
        stats["swinT"] = sstats

    for k in range(1, 9):
        params[f"upsample_and_conv{k}"] = {
            "conv": _conv_p(state, f"decoder.upsample_and_conv{k}.1")}
    for k in range(1, 7):
        params[f"conv{k}"] = _conv_p(state, f"decoder.conv{k}")
    return params, stats


def hybrid_swint2_from_torch(state, model, img_size) -> Tuple[Dict, Dict]:
    """-> (params, batch_stats) for ``hemit_hybrid.HybridSwinT_2``.

    torch layout: cnn_block.{0,1} + .{4,5}, ``model.*`` timm Swin,
    ``decoder.upsample{1..3}`` (ConvTranspose2d k2 s2), ``decoder.conv{1..3}``,
    ``decoder.final_upsample_layers.{i}``."""
    state = generator_state_dict(state)
    params: Dict = {}
    stats: Dict = {}
    for i, slot in enumerate((0, 4)):
        p, s = _cnn_stage(state, f"cnn_block.{slot}", f"cnn_block.{slot + 1}")
        params[f"cnn{i}"] = p
        stats[f"cnn{i}"] = s

    from .swin import SwinConfig

    post_cnn = (img_size[0] // 4, img_size[1] // 4)
    swin_cfg = SwinConfig(
        img_size=post_cnn, patch_size=model.patch_size,
        embed_dim=model.embed_dim, depths=tuple(model.depths),
        num_heads=tuple(model.num_heads), window_size=model.window_size,
        qkv_bias=False)
    params["swinT"], sstats = _swin_branch(state, swin_cfg, "model.")
    if sstats:
        stats["swinT"] = sstats

    for k in range(1, 4):
        params[f"upsample{k}"] = {
            "kernel": _convT(np.asarray(state[f"decoder.upsample{k}.weight"])),
            "bias": np.asarray(state[f"decoder.upsample{k}.bias"])}
        params[f"conv{k}"] = _conv_p(state, f"decoder.conv{k}")
    n_final = int(np.log2(model.patch_size)) + 2
    for i in range(n_final):
        params[f"final_up{i}"] = {
            "kernel": _convT(np.asarray(
                state[f"decoder.final_upsample_layers.{i}.weight"])),
            "bias": np.asarray(
                state[f"decoder.final_upsample_layers.{i}.bias"])}
    return params, stats


def _vit_block_from_torch(state, base: str) -> Dict:
    """HEMIT Cross_Att's 1-depth pre-norm transformer
    (reference Transformer :948-965): layers.0.0 = PreNorm(Attention),
    layers.0.1 = PreNorm(FeedForward)."""
    return {
        "attn_norm": {"scale": np.asarray(state[f"{base}.layers.0.0.norm.weight"]),
                      "bias": np.asarray(state[f"{base}.layers.0.0.norm.bias"])},
        "to_qkv": {"kernel": _t(np.asarray(
            state[f"{base}.layers.0.0.fn.to_qkv.weight"]))},
        "to_out": {"kernel": _t(np.asarray(
            state[f"{base}.layers.0.0.fn.to_out.0.weight"])),
            "bias": np.asarray(state[f"{base}.layers.0.0.fn.to_out.0.bias"])},
        "ff_norm": {"scale": np.asarray(state[f"{base}.layers.0.1.norm.weight"]),
                    "bias": np.asarray(state[f"{base}.layers.0.1.norm.bias"])},
        "ff_fc1": {"kernel": _t(np.asarray(
            state[f"{base}.layers.0.1.fn.net.0.weight"])),
            "bias": np.asarray(state[f"{base}.layers.0.1.fn.net.0.bias"])},
        "ff_fc2": {"kernel": _t(np.asarray(
            state[f"{base}.layers.0.1.fn.net.3.weight"])),
            "bias": np.asarray(state[f"{base}.layers.0.1.fn.net.3.bias"])},
    }


def swin_unet_from_torch(state, model, img_size) -> Tuple[Dict, Dict]:
    """-> (params, batch_stats) for ``hemit_hybrid.SwinUnetGenerator``.

    torch layout: down_layers.{i}.{0 conv, 2 bn} (innermost has no bn),
    up_layers.{i}.{0 deconv, 2 bn}, final_layer.0, ``swinT.*`` timm Swin,
    cross_atts.{j}.{gate.0, norm_swinT, linear_swinT, transformer_unet.*}.
    The reference's unused Cross_Att submodules (transformer_swinT,
    norm_unet, linear_unet) are ignored."""
    state = generator_state_dict(state)
    params: Dict = {}
    stats: Dict = {}
    for i in range(model.num_downs):
        params[f"down{i}"] = _conv_p(state, f"down_layers.{i}.0")
        if i != model.num_downs - 1:
            bp, bs = _bn_pair(state, f"down_layers.{i}.2")
            params[f"down{i}_norm"] = bp
            stats[f"down{i}_norm"] = bs

    from .swin import SwinConfig

    swin_cfg = SwinConfig(
        img_size=tuple(img_size), patch_size=model.patch_size,
        embed_dim=model.embed_dim, depths=tuple(model.depths),
        num_heads=tuple(model.num_heads), window_size=model.window_size,
        qkv_bias=True)
    params["swinT"], sstats = _swin_branch(state, swin_cfg, "swinT.")
    if sstats:
        stats["swinT"] = sstats

    for j in range(3):
        base = f"cross_atts.{j}"
        params[f"cross_att{j}"] = {
            "gate": _conv_p(state, f"{base}.gate.0"),
            "norm_swinT": {"scale": np.asarray(state[f"{base}.norm_swinT.weight"]),
                           "bias": np.asarray(state[f"{base}.norm_swinT.bias"])},
            "linear_swinT": {"kernel": _t(np.asarray(
                state[f"{base}.linear_swinT.weight"])),
                "bias": np.asarray(state[f"{base}.linear_swinT.bias"])},
            "transformer_unet": _vit_block_from_torch(
                state, f"{base}.transformer_unet"),
        }

    n_up = model.num_downs - 1
    for i in range(n_up):
        params[f"up{i}"] = {
            "kernel": _convT(np.asarray(state[f"up_layers.{i}.0.weight"])),
            "bias": np.asarray(state[f"up_layers.{i}.0.bias"])}
        bp, bs = _bn_pair(state, f"up_layers.{i}.2")
        params[f"up{i}_norm"] = bp
        stats[f"up{i}_norm"] = bs
    params["up_final"] = {
        "kernel": _convT(np.asarray(state["final_layer.0.weight"])),
        "bias": np.asarray(state["final_layer.0.bias"])}
    return params, stats
