"""Foundation-encoder registry: ViTConfig presets for the pathology models.

Mirrors the reference registry (reference:
src/generators/foundation_models.py:187-195) with timm-free configs. The
architectural parameters come from the timm model definitions each reference
constructor names; weight import (import_weights.py) auto-detects the MLP
flavor from checkpoint shapes as a guard.

``ctranspath`` (Swin-tiny + conv stem) and ``restnet50_lunit_swav`` are
CNN/Swin encoders used only by the UNETR baseline path; they are registered
here with ``family`` markers and implemented in their model files.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from .vit import ViTConfig


@dataclasses.dataclass(frozen=True)
class EncoderSpec:
    name: str
    family: str                     # "vit" | "swin" | "resnet"
    vit_cfg: Optional[ViTConfig] = None
    hf_repo: Optional[str] = None   # provenance only; no net access assumed
    swin_cfg: Optional[object] = None


def _vit(img_size: Tuple[int, int], **kw) -> ViTConfig:
    return ViTConfig(img_size=img_size, **kw)


def get_encoder_spec(name: str, img_size) -> EncoderSpec:
    if isinstance(img_size, int):
        img_size = (img_size, img_size)

    if name == "hoptimus0":
        # timm vit_giant_patch14_reg4_dinov2: 40 x 1536, 24 heads, packed
        # SwiGLU (hidden 4096), layerscale 1e-5, cls + 4 reg tokens,
        # no_embed_class (reference: foundation_models.py:50-69)
        return EncoderSpec(name, "vit", _vit(
            img_size, patch_size=14, embed_dim=1536, depth=40, num_heads=24,
            mlp_hidden_dim=4096, mlp_type="swiglu", init_values=1e-5,
            reg_tokens=4, no_embed_class=True,
        ), "bioptimus/H-optimus-0")

    if name == "univ2":
        # timm vit_giant_patch14_224 w/ overrides: depth 24, 24 heads,
        # SwiGLU hidden int(1536*2.66667*2)/2 = 4096, 8 reg tokens,
        # no_embed_class (reference: foundation_models.py:24-47)
        return EncoderSpec(name, "vit", _vit(
            img_size, patch_size=14, embed_dim=1536, depth=24, num_heads=24,
            mlp_hidden_dim=4096, mlp_type="swiglu", init_values=1e-5,
            reg_tokens=8, no_embed_class=True,
        ), "MahmoodLab/UNI2-h")

    if name == "provgigapath":
        # timm vit_giant_patch14_dinov2 w/ patch_size=16: 40 x 1536, SwiGLU,
        # no reg tokens, embed-class pos embed
        # (reference: foundation_models.py:93-111)
        return EncoderSpec(name, "vit", _vit(
            img_size, patch_size=16, embed_dim=1536, depth=40, num_heads=24,
            mlp_hidden_dim=4096, mlp_type="swiglu", init_values=1e-5,
            reg_tokens=0, no_embed_class=False,
        ), "prov-gigapath/prov-gigapath")

    if name == "phikonv2":
        # timm vit_large_patch14_dinov2 w/ patch_size=16: 24 x 1024, GELU MLP
        # ratio 4, layerscale (reference: foundation_models.py:114-136)
        return EncoderSpec(name, "vit", _vit(
            img_size, patch_size=16, embed_dim=1024, depth=24, num_heads=16,
            mlp_hidden_dim=4096, mlp_type="gelu", init_values=1e-5,
            reg_tokens=0, no_embed_class=False,
        ), "owkin/phikon-v2")

    if name == "sp85m":
        # timm vit_base_patch16_224: 12 x 768, GELU, no layerscale, embed-class
        # (reference: foundation_models.py:71-90)
        return EncoderSpec(name, "vit", _vit(
            img_size, patch_size=16, embed_dim=768, depth=12, num_heads=12,
            mlp_hidden_dim=3072, mlp_type="gelu", init_values=None,
            reg_tokens=0, no_embed_class=False, norm_eps=1e-6,
        ), "MountSinaiCompPath/SP85M")

    if name == "ctranspath":
        # timm swin_tiny_patch4_window7 with a conv stem
        # (reference: foundation_models.py:161-184, 321-367)
        from .swin import SwinConfig

        return EncoderSpec(name, "swin", None, "jamesdolezal/CTransPath",
                           swin_cfg=SwinConfig(
                               img_size=img_size, patch_size=4, embed_dim=96,
                               depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
                               window_size=7, conv_stem=True))

    if name == "restnet50_lunit_swav":
        return EncoderSpec(name, "resnet", None, "1aurent/resnet50.lunit_swav")

    raise KeyError(
        f"Unknown encoder {name!r}; known: hoptimus0, univ2, provgigapath, "
        "phikonv2, sp85m, ctranspath, restnet50_lunit_swav"
    )


FOUNDATION_MODEL_NAMES = (
    "univ2", "hoptimus0", "sp85m", "provgigapath", "phikonv2",
    "restnet50_lunit_swav", "ctranspath",
)
