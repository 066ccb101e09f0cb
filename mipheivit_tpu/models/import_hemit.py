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
