"""Generator construction + checkpoint loading for eval/inference drivers.

Mirrors the reference load path (reference: src/inference.py:134-153):
prefer ``model.safetensors`` (strict=False with ``validate_load_info``
semantics, foundation encoder possibly stripped), fall back to the Lightning
``model.weights.ckpt`` (strict, ``generator.`` prefix).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from ..models import get_generator, get_encoder_spec
from ..models.import_weights import (
    load_state_dict,
    mipheivit_from_torch,
)


def build_generator(cfg, img_size, nc_out, dtype: str = "float32"):
    model_name = cfg.model.model_name
    return get_generator(model_name, img_size, 3, nc_out, cfg, dtype=dtype)


def load_generator(cfg, checkpoint_dir: str, img_size, nc_out: int,
                   dtype: str = "float32",
                   encoder_ckpt_path: Optional[str] = None):
    """Returns (model, variables) ready for ``model.apply``."""
    model = build_generator(cfg, img_size, nc_out, dtype=dtype)
    ckpt_dir = Path(checkpoint_dir)
    st_path = ckpt_dir / "model.safetensors"
    ckpt_path = ckpt_dir / "model.weights.ckpt"
    if st_path.exists():
        state = load_state_dict(str(st_path))
    elif ckpt_path.exists():
        state = load_state_dict(str(ckpt_path))
    else:
        raise FileNotFoundError(
            f"no model.safetensors or model.weights.ckpt in {checkpoint_dir}")

    model_name = cfg.model.model_name
    if model_name.startswith("myvitmatte"):
        encoder_state = None
        enc_path = encoder_ckpt_path or cfg.select("model.encoder.encoder_weights")
        if enc_path and Path(str(enc_path)).exists():
            encoder_state = load_state_dict(str(enc_path))
        params, batch_stats = mipheivit_from_torch(
            state, model.vit_cfg, out_chans=nc_out,
            encoder_state=encoder_state)
        return model, {"params": params, "batch_stats": batch_stats}

    if model_name.startswith("unet") and hasattr(model, "vit_cfg"):
        from ..models.import_weights import unetr_from_torch

        encoder_state = None
        enc_path = encoder_ckpt_path or cfg.select("model.encoder.encoder_weights")
        if enc_path and Path(str(enc_path)).exists():
            encoder_state = load_state_dict(str(enc_path))
        params, batch_stats = unetr_from_torch(
            state, model.vit_cfg, out_chans=nc_out,
            encoder_state=encoder_state)
        return model, {"params": params, "batch_stats": batch_stats}

    raise NotImplementedError(
        f"checkpoint import not implemented for {model_name!r}")
