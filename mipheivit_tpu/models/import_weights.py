"""Checkpoint import: torch/timm state dicts -> flax param/batch_stats trees.

Handles the three checkpoint flavors the reference ecosystem produces:

  * raw timm foundation-model checkpoints (HF hub .bin / .safetensors /
    local torch files — reference: src/generators/foundation_models.py:37-68),
  * released MIPHEI-ViT generator safetensors with the frozen encoder
    stripped (reference: scripts/ckpt_remove_foundation_model.py:7-22,
    loaded strict=False at src/inference.py:135-153),
  * Lightning ``model.weights.ckpt`` files (``generator.`` prefix,
    reference: src/inference.py:79-84).

Conversions are layout-only plus the documented abs-pos-embed resample
(timm ``resample_abs_pos_embed`` = bicubic antialias, reference:
foundation_models.py:198-208). All numpy; no torch needed for safetensors.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from .vit import ViTConfig
from ..ops.resize import resize_matrix


# ---------------------------------------------------------------------------
# state-dict loading


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a checkpoint file into a flat {name: np.ndarray} dict."""
    path = str(path)
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    # torch pickle formats (.bin/.pth/.ckpt)
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "model" in obj and all(
        not hasattr(v, "numpy") for k, v in obj.items() if k != "model"
    ):
        obj = obj["model"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}


def strip_prefix(state: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
    return out


def generator_state_dict(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Extract the generator from a Lightning checkpoint
    (reference: src/inference.py:79-84); also strips torch.compile's
    ``_orig_mod.`` (reference: src/utils.py:133-141)."""
    if any(k.startswith("generator.") for k in state):
        state = strip_prefix(state, "generator.")
    return {k.replace("_orig_mod.", ""): v for k, v in state.items()}


# ---------------------------------------------------------------------------
# pos-embed resampling


def resample_pos_embed(
    pos: np.ndarray,
    new_grid: Tuple[int, int],
    num_prefix_tokens: int = 0,
    old_grid: Optional[Tuple[int, int]] = None,
) -> np.ndarray:
    """timm ``resample_abs_pos_embed`` parity: bicubic + antialias=True
    (PIL-style kernel), prefix tokens carried through untouched."""
    prefix = pos[:, :num_prefix_tokens]
    body = pos[:, num_prefix_tokens:]
    n = body.shape[1]
    if old_grid is None:
        side = int(round(np.sqrt(n)))
        old_grid = (side, side)
    if tuple(old_grid) == tuple(new_grid):
        return pos
    d = body.shape[-1]
    grid = body.reshape(old_grid[0], old_grid[1], d).astype(np.float64)
    mh = resize_matrix(old_grid[0], new_grid[0], "bicubic", antialias=True).astype(np.float64)
    mw = resize_matrix(old_grid[1], new_grid[1], "bicubic", antialias=True).astype(np.float64)
    grid = np.einsum("oh,hwd->owd", mh, grid)
    grid = np.einsum("ow,hwd->hod", mw, grid)
    body = grid.reshape(1, new_grid[0] * new_grid[1], d).astype(pos.dtype)
    if num_prefix_tokens:
        return np.concatenate([prefix, body], axis=1)
    return body


# ---------------------------------------------------------------------------
# ViT import


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear weight [out, in] -> flax Dense kernel [in, out]."""
    return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:
    """torch conv weight OIHW -> flax HWIO."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def detect_mlp_type(state: Dict[str, np.ndarray], prefix: str = "") -> str:
    """Auto-detect packed-SwiGLU vs GELU MLP from fc1/fc2 shapes."""
    for key in (f"{prefix}blocks.0.mlp.fc1.weight", f"{prefix}blocks.0.mlp.w12.weight"):
        if key in state:
            fc1_out = state[key].shape[0]
            fc2_key = key.replace("fc1", "fc2").replace("w12", "w3")
            fc2_in = state[fc2_key].shape[1]
            return "swiglu" if fc1_out == 2 * fc2_in else "gelu"
    raise KeyError(f"No MLP weights found under prefix {prefix!r}")


def vit_params_from_torch(
    state: Dict[str, np.ndarray],
    cfg: ViTConfig,
    prefix: str = "",
) -> Dict:
    """Build the flax param tree for ``VisionTransformer`` from timm keys.

    Accepts both plain ``attn.qkv.weight`` and the LoRA-wrapped
    ``attn.qkv.qkv.weight`` (+ ``lora_q/lora_v`` ``A``/``B``) layouts
    (reference: src/generators/lora.py:21-33).
    """

    def get(key):
        return np.asarray(state[prefix + key])

    def has(key):
        return (prefix + key) in state

    # normalize mlp key flavor (hf dinov2 exports use w12/w3)
    def mlp_key(i, which):
        for a, b in (("fc1", "w12"), ("fc2", "w3")):
            if which == a and not has(f"blocks.{i}.mlp.{a}.weight"):
                return f"blocks.{i}.mlp.{b}"
        return f"blocks.{i}.mlp.{which}"

    params: Dict = {}
    params["patch_embed"] = {
        "kernel": _conv(get("patch_embed.proj.weight")),
        "bias": get("patch_embed.proj.bias"),
    }
    if cfg.class_token:
        params["cls_token"] = get("cls_token")
    if cfg.reg_tokens:
        params["reg_token"] = get("reg_token")

    n_prefix_in_pos = 0 if cfg.no_embed_class else cfg.num_prefix_tokens
    params["pos_embed"] = resample_pos_embed(
        get("pos_embed"), cfg.grid_size, num_prefix_tokens=n_prefix_in_pos
    )

    def qkv_keys(i):
        base = f"blocks.{i}.attn.qkv"
        if has(f"{base}.qkv.weight"):  # LoRA-wrapped
            return f"{base}.qkv", base
        return base, base

    layers = []
    for i in range(cfg.depth):
        qkv_base, lora_base = qkv_keys(i)
        attn = {
            "qkv": {
                "kernel": _t(get(f"{qkv_base}.weight")),
                "bias": get(f"{qkv_base}.bias"),
            },
            "proj": {
                "kernel": _t(get(f"blocks.{i}.attn.proj.weight")),
                "bias": get(f"blocks.{i}.attn.proj.bias"),
            },
        }
        if cfg.lora_rank > 0:
            for lq in ("lora_q", "lora_v"):
                if has(f"{lora_base}.{lq}.A"):
                    attn[lq] = {
                        "A": get(f"{lora_base}.{lq}.A"),
                        "B": get(f"{lora_base}.{lq}.B"),
                    }
                else:  # checkpoint without adapters: fresh init (zeros B)
                    rng = np.random.default_rng(i)
                    attn[lq] = {
                        "A": (rng.standard_normal((cfg.embed_dim, cfg.lora_rank))
                              / np.sqrt(cfg.lora_rank)).astype(np.float32),
                        "B": np.zeros((cfg.lora_rank, cfg.embed_dim), np.float32),
                    }
        layer = {
            "norm1": {"scale": get(f"blocks.{i}.norm1.weight"),
                      "bias": get(f"blocks.{i}.norm1.bias")},
            "attn": attn,
            "norm2": {"scale": get(f"blocks.{i}.norm2.weight"),
                      "bias": get(f"blocks.{i}.norm2.bias")},
            "mlp": {
                "fc1": {"kernel": _t(get(f"{mlp_key(i, 'fc1')}.weight")),
                        "bias": get(f"{mlp_key(i, 'fc1')}.bias")},
                "fc2": {"kernel": _t(get(f"{mlp_key(i, 'fc2')}.weight")),
                        "bias": get(f"{mlp_key(i, 'fc2')}.bias")},
            },
        }
        if cfg.init_values is not None:
            layer["ls1"] = get(f"blocks.{i}.ls1.gamma")
            layer["ls2"] = get(f"blocks.{i}.ls2.gamma")
        layers.append(layer)

    if cfg.scan_blocks:
        import jax

        params["blocks"] = jax.tree.map(lambda *xs: np.stack(xs, 0), *layers)
    else:
        for i, layer in enumerate(layers):
            params[f"blocks_{i}"] = layer

    params["norm"] = {"scale": get("norm.weight"), "bias": get("norm.bias")}
    return params


# ---------------------------------------------------------------------------
# decoder / generator import


def _bn(state, base):
    params = {"scale": np.asarray(state[f"{base}.weight"]),
              "bias": np.asarray(state[f"{base}.bias"])}
    stats = {"mean": np.asarray(state[f"{base}.running_mean"]),
             "var": np.asarray(state[f"{base}.running_var"])}
    return params, stats


def _conv_p(state, base, bias=True):
    p = {"kernel": _conv(np.asarray(state[f"{base}.weight"]))}
    if bias:
        p["bias"] = np.asarray(state[f"{base}.bias"])
    return p


def decoder_params_from_torch(
    state: Dict[str, np.ndarray], out_chans: int, prefix: str = "decoder."
) -> Tuple[Dict, Dict]:
    """Detail_Capture import (reference key layout from
    src/generators/mipheivit.py:166-219 + unet.py:407-438)."""
    params: Dict = {}
    stats: Dict = {}

    cs_p, cs_s = {}, {}
    for i in range(3):
        base = f"{prefix}convstream.convs.{i}"
        conv = _conv_p(state, f"{base}.conv", bias=False)
        bnp, bns = _bn(state, f"{base}.bn")
        cs_p[f"convs_{i}"] = {"conv": conv, "bn": bnp}
        cs_s[f"convs_{i}"] = {"bn": bns}
    params["convstream"] = cs_p
    stats["convstream"] = cs_s

    for i in range(4):
        base = f"{prefix}fusion_blks.{i}.conv"
        conv = _conv_p(state, f"{base}.conv", bias=False)
        bnp, bns = _bn(state, f"{base}.bn")
        params[f"fusion_blks_{i}"] = {"conv": {"conv": conv, "bn": bnp}}
        stats[f"fusion_blks_{i}"] = {"conv": {"bn": bns}}

    for k in range(out_chans):
        base = f"{prefix}segmentation_head_{k}"
        att_p = {
            "psi_conv1": _conv_p(state, f"{base}.0.psi.0"),
            "psi_conv2": _conv_p(state, f"{base}.0.psi.3"),
        }
        bnp, bns = _bn(state, f"{base}.0.psi.1")
        att_p["psi_bn"] = bnp
        params[f"segmentation_head_{k}"] = {
            "attention": att_p,
            "conv": _conv_p(state, f"{base}.1"),
        }
        stats[f"segmentation_head_{k}"] = {"attention": {"psi_bn": bns}}

    return params, stats


def mipheivit_from_torch(
    state: Dict[str, np.ndarray],
    cfg: ViTConfig,
    out_chans: int = 16,
    encoder_state: Optional[Dict[str, np.ndarray]] = None,
) -> Tuple[Dict, Dict]:
    """Full-generator import -> (params, batch_stats).

    ``state`` is the generator state dict (released safetensors or stripped
    Lightning ckpt). When the encoder was FM-stripped, pass the raw
    foundation checkpoint as ``encoder_state``; LoRA adapters present in
    ``state`` override (matching strict=False + validate_load_info,
    reference: src/inference.py:28-45, 135-153).
    """
    state = generator_state_dict(state)
    enc_present = any(k.startswith("encoder.vit.") and ".lora" not in k
                      for k in state)
    if enc_present:
        vit_state = strip_prefix(state, "encoder.vit.")
    else:
        if encoder_state is None:
            raise ValueError(
                "Checkpoint has the foundation encoder stripped "
                "(scripts/ckpt_remove_foundation_model.py parity); pass "
                "encoder_state with the raw foundation checkpoint."
            )
        vit_state = dict(encoder_state)
        # graft LoRA adapters (and any stray encoder keys) from the generator
        for k, v in strip_prefix(state, "encoder.vit.").items():
            vit_state[k] = v
        # the generator wraps qkv when LoRA was applied; normalize plain keys
        if any(".qkv.qkv." in k for k in vit_state):
            for k in list(vit_state):
                m = re.match(r"(blocks\.\d+\.attn\.qkv)\.(weight|bias)$", k)
                if m and f"{m.group(1)}.qkv.{m.group(2)}" not in vit_state:
                    vit_state[f"{m.group(1)}.qkv.{m.group(2)}"] = vit_state.pop(k)

    vit_params = vit_params_from_torch(vit_state, cfg)
    dec_params, dec_stats = decoder_params_from_torch(state, out_chans)
    params = {"encoder": {"vit": vit_params}, "decoder": dec_params}
    batch_stats = {"decoder": dec_stats}
    return params, batch_stats


def validate_load(missing_keys, unexpected_keys) -> None:
    """Parity with reference ``validate_load_info``
    (src/inference.py:28-45)."""
    if unexpected_keys:
        raise ValueError(f"Unexpected keys in state_dict: {unexpected_keys}")
    for key in missing_keys:
        if ".lora" in key:
            raise ValueError(f"Missing LoRA checkpoint in state_dict: {key}")
        if not any(part in key for part in ("encoder.vit.", "encoder.model.")):
            raise ValueError(f"Missing key in state_dict: {key}")


# ---------------------------------------------------------------------------
# UNETR import (reference: src/generators/unet.py layout)


def _convT(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight [in, out, kh, kw] -> flax ConvTranspose
    kernel [kh, kw, in, out]. flax's conv_transpose correlates (no spatial
    flip) while torch's is the conv gradient, so flip H/W (verified exact
    for the k2/s2 and k4/s2 cases used here)."""
    return np.ascontiguousarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))


def _conv_block(state, base):
    """reference Conv2DBlock: block.0 conv, block.1 BN."""
    params = {
        "conv": {"kernel": _conv(np.asarray(state[f"{base}.block.0.weight"])),
                 "bias": np.asarray(state[f"{base}.block.0.bias"])},
        "bn": {"scale": np.asarray(state[f"{base}.block.1.weight"]),
               "bias": np.asarray(state[f"{base}.block.1.bias"])},
    }
    stats = {"bn": {"mean": np.asarray(state[f"{base}.block.1.running_mean"]),
                    "var": np.asarray(state[f"{base}.block.1.running_var"])}}
    return params, stats


def _deconv_block(state, base):
    """reference Deconv2DBlock: block.0 ConvT, block.1 conv, block.2 BN."""
    params = {
        "deconv": {"kernel": _convT(np.asarray(state[f"{base}.block.0.weight"])),
                   "bias": np.asarray(state[f"{base}.block.0.bias"])},
        "conv": {"kernel": _conv(np.asarray(state[f"{base}.block.1.weight"])),
                 "bias": np.asarray(state[f"{base}.block.1.bias"])},
        "bn": {"scale": np.asarray(state[f"{base}.block.2.weight"]),
               "bias": np.asarray(state[f"{base}.block.2.bias"])},
    }
    stats = {"bn": {"mean": np.asarray(state[f"{base}.block.2.running_mean"]),
                    "var": np.asarray(state[f"{base}.block.2.running_var"])}}
    return params, stats


def unetr_from_torch(state, vit_cfg, out_chans: int,
                     encoder_state=None):
    """UNETR (ViT pyramid) generator import -> (params, batch_stats).

    Key layout from the reference ``Unet``/``ViTPyramidEncoder``/
    ``ViTFeatureUpsampler``/``Decoder`` (src/generators/unet.py): the timm
    ViT under ``encoder.model.``, upsamplers as Sequential indices (slot 0
    is the parameter-free Upsample/Identity), CellViT decoder stages.
    """
    state = generator_state_dict(state)
    enc_present = any(k.startswith("encoder.model.") and ".lora" not in k
                      for k in state)
    if enc_present:
        vit_state = strip_prefix(state, "encoder.model.")
    else:
        if encoder_state is None:
            raise ValueError("foundation-stripped checkpoint: pass encoder_state")
        vit_state = dict(encoder_state)
        for k, v in strip_prefix(state, "encoder.model.").items():
            vit_state[k] = v
        if any(".qkv.qkv." in k for k in vit_state):
            for k in list(vit_state):
                m = re.match(r"(blocks\.\d+\.attn\.qkv)\.(weight|bias)$", k)
                if m and f"{m.group(1)}.qkv.{m.group(2)}" not in vit_state:
                    vit_state[f"{m.group(1)}.qkv.{m.group(2)}"] = vit_state.pop(k)

    params = {"encoder_vit": vit_params_from_torch(vit_state, vit_cfg)}
    stats = {}

    fu_p, fu_s = {}, {}
    fu = "encoder.feature_upsampler"
    for i in range(2):
        p, s = _conv_block(state, f"{fu}.convsteam.{i}")
        fu_p[f"convsteam_{i}"], fu_s[f"convsteam_{i}"] = p, s
    for j, n_deconv in ((0, 3), (1, 2), (2, 1)):
        for d in range(n_deconv):
            # Sequential slot 0 is Upsample/Identity -> deconvs start at 1
            p, s = _deconv_block(state, f"{fu}.upsampler{j}.{d + 1}")
            fu_p[f"upsampler{j}_{d}"], fu_s[f"upsampler{j}_{d}"] = p, s
    params["feature_upsampler"] = fu_p
    stats["feature_upsampler"] = fu_s

    dec_p, dec_s = {}, {}
    dec_p["bottleneck_upsampler"] = {
        "kernel": _convT(np.asarray(state["decoder.bottleneck_upsampler.weight"])),
        "bias": np.asarray(state["decoder.bottleneck_upsampler.bias"])}
    for stage, n_blocks in (("decoder3", 3), ("decoder2", 2), ("decoder1", 2)):
        base = f"decoder.{stage}_upsampler"
        for b in range(n_blocks):
            p, s = _conv_block(state, f"{base}.{b}")
            dec_p[f"{stage}_{b}"], dec_s[f"{stage}_{b}"] = p, s
        dec_p[f"{stage}_up"] = {
            "kernel": _convT(np.asarray(state[f"{base}.{n_blocks}.weight"])),
            "bias": np.asarray(state[f"{base}.{n_blocks}.bias"])}
    for b in range(2):
        p, s = _conv_block(state, f"decoder.decoder0_header.{b}")
        dec_p[f"decoder0_{b}"], dec_s[f"decoder0_{b}"] = p, s
    dec_p["decoder0_out"] = {
        "kernel": _conv(np.asarray(state["decoder.decoder0_header.2.weight"])),
        "bias": np.asarray(state["decoder.decoder0_header.2.bias"])}
    params["decoder"] = dec_p
    stats["decoder"] = dec_s

    for k in range(out_chans):
        base = f"segmentation_head_{k}"
        att = {
            "psi_conv1": _conv_p(state, f"{base}.0.psi.0"),
            "psi_conv2": _conv_p(state, f"{base}.0.psi.3"),
        }
        bnp, bns = _bn(state, f"{base}.0.psi.1")
        att["psi_bn"] = bnp
        params[base] = {"attention": att, "conv": _conv_p(state, f"{base}.1")}
        stats[base] = {"attention": {"psi_bn": bns}}
    return params, stats


# ---------------------------------------------------------------------------
# Swin import (timm layout; ctranspath conv stem; HEMIT swinT branch)


def adapt_checkpoint_ctranspath(state):
    """Shift old-timm end-of-stage downsample keys to the stage they feed
    and drop buffers (reference: foundation_models.py:370-383)."""
    out = {}
    for k, v in state.items():
        if ".downsample.norm" in k or "downsample.reduction" in k:
            parts = k.split(".")
            parts[1] = str(int(parts[1]) + 1)
            k = ".".join(parts)
        elif "relative_position_index" in k or "attn_mask" in k:
            continue
        out[k] = v
    return out


def resize_rel_pos_bias_table(table: np.ndarray, new_window: int) -> np.ndarray:
    """timm ``resize_rel_pos_bias_table`` role: bicubic-resample the
    [(2w-1)^2, H] table onto a new window size."""
    n, heads = table.shape
    old = int(round(np.sqrt(n)))
    new = 2 * new_window - 1
    if old == new:
        return table
    grid = table.reshape(old, old, heads).astype(np.float64)
    mh = resize_matrix(old, new, "bicubic", antialias=True).astype(np.float64)
    grid = np.einsum("oh,hwd->owd", mh, grid)
    grid = np.einsum("ow,hwd->hod", mh, grid)
    return grid.reshape(new * new, heads).astype(table.dtype)


def swin_params_from_torch(state, cfg, prefix: str = "") -> Dict:
    """flax param tree for models.swin.SwinTransformer from timm keys.

    ``cfg``: models.swin.SwinConfig. Handles the ctranspath conv stem
    (patch_embed.proj.{0,1,3,4,6} Sequential) and plain conv patch embeds;
    rel-pos tables are resampled if the window differs.
    Returns (params, batch_stats) — stats only for the conv stem BNs.
    """

    def get(key):
        return np.asarray(state[prefix + key])

    def has(key):
        return (prefix + key) in state

    params: Dict = {}
    stats: Dict = {}
    if cfg.conv_stem:
        pe_p: Dict = {}
        pe_s: Dict = {}
        for i, slot in enumerate((0, 3)):
            pe_p[f"conv{i}"] = {"kernel": _conv(get(f"patch_embed.proj.{slot}.weight"))}
            pe_p[f"bn{i}"] = {"scale": get(f"patch_embed.proj.{slot + 1}.weight"),
                              "bias": get(f"patch_embed.proj.{slot + 1}.bias")}
            pe_s[f"bn{i}"] = {"mean": get(f"patch_embed.proj.{slot + 1}.running_mean"),
                              "var": get(f"patch_embed.proj.{slot + 1}.running_var")}
        pe_p["proj"] = {"kernel": _conv(get("patch_embed.proj.6.weight")),
                        "bias": get("patch_embed.proj.6.bias")}
        pe_p["norm"] = {"scale": get("patch_embed.norm.weight"),
                        "bias": get("patch_embed.norm.bias")}
        params["patch_embed"] = pe_p
        stats["patch_embed"] = pe_s
    else:
        params["patch_embed"] = {"kernel": _conv(get("patch_embed.proj.weight")),
                                 "bias": get("patch_embed.proj.bias")}
        params["patch_norm"] = {"scale": get("patch_embed.norm.weight"),
                                "bias": get("patch_embed.norm.bias")}

    for si, depth in enumerate(cfg.depths):
        # effective window shrinks when the stage's grid is smaller
        # (models.swin.SwinBlock uses win = min(window, H, W))
        grid = min(cfg.img_size) // cfg.patch_size // (2 ** si)
        eff_window = min(cfg.window_size, grid)
        if si > 0:
            params[f"downsample{si}"] = {
                "norm": {"scale": get(f"layers.{si}.downsample.norm.weight"),
                         "bias": get(f"layers.{si}.downsample.norm.bias")},
                "reduction": {"kernel": _t(get(f"layers.{si}.downsample.reduction.weight"))},
            }
        for bi in range(depth):
            base = f"layers.{si}.blocks.{bi}"
            qkv_base = base + ".attn.qkv"
            if has(f"{qkv_base}.qkv.weight"):
                qkv_base = qkv_base + ".qkv"
            table = get(f"{base}.attn.relative_position_bias_table")
            table = resize_rel_pos_bias_table(table, eff_window)
            qkv_p = {"kernel": _t(get(f"{qkv_base}.weight"))}
            if has(f"{qkv_base}.bias"):    # qkv_bias=False in the HEMIT hybrids
                qkv_p["bias"] = get(f"{qkv_base}.bias")
            blk = {
                "norm1": {"scale": get(f"{base}.norm1.weight"),
                          "bias": get(f"{base}.norm1.bias")},
                "attn": {
                    "qkv": qkv_p,
                    "proj": {"kernel": _t(get(f"{base}.attn.proj.weight")),
                             "bias": get(f"{base}.attn.proj.bias")},
                    "relative_position_bias_table": table,
                },
                "norm2": {"scale": get(f"{base}.norm2.weight"),
                          "bias": get(f"{base}.norm2.bias")},
                "mlp_fc1": {"kernel": _t(get(f"{base}.mlp.fc1.weight")),
                            "bias": get(f"{base}.mlp.fc1.bias")},
                "mlp_fc2": {"kernel": _t(get(f"{base}.mlp.fc2.weight")),
                            "bias": get(f"{base}.mlp.fc2.bias")},
            }
            if cfg.lora_rank > 0:
                lora_base = f"{base}.attn.qkv"
                for lq in ("lora_q", "lora_v"):
                    if has(f"{lora_base}.{lq}.A"):
                        blk["attn"][lq] = {"A": get(f"{lora_base}.{lq}.A"),
                                           "B": get(f"{lora_base}.{lq}.B")}
                    else:
                        rng = np.random.default_rng(si * 100 + bi)
                        dim = cfg.stage_dim(si)
                        blk["attn"][lq] = {
                            "A": (rng.standard_normal((dim, cfg.lora_rank))
                                  / np.sqrt(cfg.lora_rank)).astype(np.float32),
                            "B": np.zeros((cfg.lora_rank, dim), np.float32)}
            params[f"layers{si}_blocks{bi}"] = blk
    params["norm"] = {"scale": get("norm.weight"), "bias": get("norm.bias")}
    return params, stats


# ---------------------------------------------------------------------------
# SMP UnetMultiHeads import (reference: src/generators/smp_unet.py:264-345,
# timm convnext encoder under smp's TimmUniversalEncoder)


def _ln_p(state, base):
    return {"scale": np.asarray(state[f"{base}.weight"]),
            "bias": np.asarray(state[f"{base}.bias"])}


def _dense_p(state, base):
    return {"kernel": np.ascontiguousarray(
                np.asarray(state[f"{base}.weight"]).T),
            "bias": np.asarray(state[f"{base}.bias"])}


def convnext_params_from_timm(state, prefix: str = "encoder.model.") -> Dict:
    """timm 1.x convnext (the `tu-convnext_large` encoder the reference
    trains — configs/default_configs/convnext.yaml:19) -> flax ConvNeXt
    trunk params, key for key. Handles both the FeatureListNet-flattened
    layout smp saves (``stages_0.blocks...``) and plain ``stages.0.``, and
    both block naming generations (conv_dw/mlp.fcN vs dwconv/pwconvN)."""
    enc: Dict = {
        "stem_conv": _conv_p(state, f"{prefix}stem.0"),
        "stem_norm": _ln_p(state, f"{prefix}stem.1"),
    }
    for s in range(4):
        sp = None
        for cand in (f"{prefix}stages_{s}.", f"{prefix}stages.{s}."):
            if (f"{cand}blocks.0.norm.weight" in state):
                sp = cand
                break
        if sp is None:
            raise KeyError(f"convnext stage {s} not found under {prefix}")
        if s > 0:
            enc[f"down{s}_norm"] = _ln_p(state, f"{sp}downsample.0")
            enc[f"down{s}_conv"] = _conv_p(state, f"{sp}downsample.1")
        b = 0
        while f"{sp}blocks.{b}.norm.weight" in state:
            bp = f"{sp}blocks.{b}."
            dw = "conv_dw" if f"{bp}conv_dw.weight" in state else "dwconv"
            fc1 = "mlp.fc1" if f"{bp}mlp.fc1.weight" in state else "pwconv1"
            fc2 = "mlp.fc2" if f"{bp}mlp.fc2.weight" in state else "pwconv2"
            enc[f"stage{s}_{b}"] = {
                "dwconv": _conv_p(state, bp + dw),
                "norm": _ln_p(state, bp + "norm"),
                "pwconv1": _dense_p(state, bp + fc1),
                "pwconv2": _dense_p(state, bp + fc2),
                "gamma": np.asarray(state[f"{bp}gamma"]),
            }
            b += 1
    return enc


def _seg_head(state, base):
    """reference unet.py SegmentationHead: [0]=AttentionBlock|Identity,
    [1]=conv."""
    p = {"conv": _conv_p(state, f"{base}.1")}
    s = {}
    if f"{base}.0.psi.0.weight" in state:
        att = {"psi_conv1": _conv_p(state, f"{base}.0.psi.0"),
               "psi_conv2": _conv_p(state, f"{base}.0.psi.3")}
        bnp, bns = _bn(state, f"{base}.0.psi.1")
        att["psi_bn"] = bnp
        p["attention"] = att
        s["attention"] = {"psi_bn": bns}
    return p, s


def smp_unet_from_torch(state: Dict[str, np.ndarray],
                        n_decoder_blocks: int = 5) -> Tuple[Dict, Dict]:
    """Full UnetMultiHeads(/FG) checkpoint -> (params, batch_stats).

    Covers: timm-convnext encoder (key for key), the reference's
    InterpDecoderBlock decoder (conv1/conv2 Conv-BN pairs,
    smp_unet.py:13-50), per-marker attention-gated heads, and the optional
    shared-decoder foreground head (UnetMultiHeadsFG:345-373)."""
    params: Dict = {"encoder": convnext_params_from_timm(state)}
    stats: Dict = {}
    for i in range(n_decoder_blocks):
        base = f"decoder.blocks.{i}"
        blk_p, blk_s = {}, {}
        for name in ("conv1", "conv2"):
            conv = _conv_p(state, f"{base}.{name}.0", bias=False)
            bnp, bns = _bn(state, f"{base}.{name}.1")
            blk_p[name] = {"conv": conv, "bn": bnp}
            blk_s[name] = {"bn": bns}
        params[f"decoder_block_{i}"] = blk_p
        stats[f"decoder_block_{i}"] = blk_s
    k = 0
    while f"segmentation_head_{k}.1.weight" in state:
        p, s = _seg_head(state, f"segmentation_head_{k}")
        params[f"segmentation_head_{k}"] = p
        if s:
            stats[f"segmentation_head_{k}"] = s
        k += 1
    if "foreground_head.1.weight" in state:
        p, s = _seg_head(state, "foreground_head")
        params["foreground_head"] = p
        if s:
            stats["foreground_head"] = s
    return params, stats
