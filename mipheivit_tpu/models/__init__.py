"""Model zoo + generator factory (reference: src/generators/__init__.py:9-56)."""

from __future__ import annotations

from .vit import ViTConfig, VisionTransformer
from .mipheivit import MipheiViT, check_input_size
from .foundation import get_encoder_spec, FOUNDATION_MODEL_NAMES


def get_generator(model_name: str, img_size, nc_in: int, nc_out: int, cfg=None,
                  dtype: str = "float32"):
    """Dispatch on ``model_name`` prefix like the reference factory.

    Returns an (un-initialized) flax module; weights come from
    ``import_weights`` or fresh init. ``cfg`` is the composed run config
    (mipheivit_tpu.config.Config).
    """
    if isinstance(img_size, int):
        img_size = (img_size, img_size)

    if model_name.startswith("myvitmatte"):
        encoder_name = "hoptimus0"
        if cfg is not None:
            encoder_name = cfg.select("model.encoder.encoder_name", "hoptimus0")
        spec = get_encoder_spec(encoder_name, img_size)
        if spec.family != "vit":
            raise ValueError("myvitmatte requires a ViT encoder")
        check_input_size(img_size)
        # myvitmatte always applies LoRA rank 8 (reference: mipheivit.py:224-233)
        vit_cfg = spec.vit_cfg.replace(lora_rank=8, lora_alpha=1.0, dtype=dtype)
        if cfg is not None:
            # serving knob: "seq_shard" runs whole-region attention over
            # the mesh's model axis (parallel/seq.py; run_inference
            # --seq_shard sets this)
            vit_cfg = vit_cfg.replace(
                attn_impl=cfg.select("model.attn_impl", vit_cfg.attn_impl),
                # training-backward knob: which residuals the encoder-block
                # remat pins (grad-identical by test; measured menu in
                # BASELINE.md — the flagship preset picks "fc1" with
                # microbatch 8 + grad_accum 2)
                remat_policy=cfg.select("model.remat_policy",
                                        vit_cfg.remat_policy))
        return MipheiViT(vit_cfg=vit_cfg, out_chans=nc_out)

    if model_name.startswith("smp_unet"):
        from .smp_unet import build_smp_unet

        return build_smp_unet(model_name, img_size, nc_in, nc_out, cfg, dtype=dtype)

    if model_name.startswith("unet"):
        from .unetr import build_unetr

        return build_unetr(model_name, img_size, nc_in, nc_out, cfg, dtype=dtype)

    if model_name.startswith("hemit"):
        from .hemit import build_hemit

        return build_hemit(img_size, nc_in, nc_out, cfg, dtype=dtype)

    raise NotImplementedError(f"Unknown model_name {model_name!r}")


__all__ = [
    "ViTConfig",
    "VisionTransformer",
    "MipheiViT",
    "check_input_size",
    "get_generator",
    "get_encoder_spec",
    "FOUNDATION_MODEL_NAMES",
]
