"""Timm-free Vision Transformer for pathology foundation encoders.

Covers the architecture space of the reference's encoder registry
(reference: src/generators/foundation_models.py:24-195): DINOv2-style ViTs
with optional register tokens, layerscale, packed-SwiGLU or GELU MLPs, and
``no_embed_class`` positional-embedding semantics; plus LoRA adapters on the
q/v slices of the fused qkv projection (reference: src/generators/lora.py).

TPU-first design decisions:
  * NHWC everywhere; the patch embed is a strided conv that XLA lowers onto
    the MXU.
  * The 40 blocks run under ``nn.scan`` (single compiled block body, stacked
    params) with optional ``nn.remat`` — compile time and HBM both drop ~40x
    vs unrolled blocks.
  * Attention is the Pallas flash kernel (ops/attention.py) on TPU.
  * Everything is shape-static: sequence length is fixed by ``img_size`` at
    construction, like the reference's ``dynamic_img_size=False`` encoders.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..ops.attention import attention_bshd, attention_qkv


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: Tuple[int, int] = (224, 224)
    patch_size: int = 14
    embed_dim: int = 1536
    depth: int = 40
    num_heads: int = 24
    mlp_hidden_dim: int = 4096       # true hidden width (post-gate for swiglu)
    mlp_type: str = "swiglu"          # "swiglu" | "gelu"
    init_values: Optional[float] = 1e-5   # layerscale init; None = no layerscale
    class_token: bool = True
    reg_tokens: int = 4
    no_embed_class: bool = True
    qkv_bias: bool = True
    norm_eps: float = 1e-6
    lora_rank: int = 0
    lora_alpha: float = 1.0
    attn_impl: str = "auto"
    mlp_impl: str = "auto"        # swiglu fc1: "auto" | "pallas" | "xla"
    quant: str = "none"           # "int8": W8A8 serving matmuls (ops/quant)
    remat: bool = True
    remat_policy: str = "full"    # "full" | "dots" (save matmul outputs)
    scan_blocks: bool = True
    scan_unroll: int = 2          # unrolled scan steps (cross-block fusion)
    dtype: str = "float32"            # compute dtype ("bfloat16" on TPU)

    @property
    def grid_size(self) -> Tuple[int, int]:
        return (self.img_size[0] // self.patch_size,
                self.img_size[1] // self.patch_size)

    @property
    def num_patches(self) -> int:
        gh, gw = self.grid_size
        return gh * gw

    @property
    def num_prefix_tokens(self) -> int:
        return (1 if self.class_token else 0) + self.reg_tokens

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    def replace(self, **kw) -> "ViTConfig":
        return dataclasses.replace(self, **kw)


class LoRA(nn.Module):
    """Low-rank adapter ``alpha * x @ A @ B`` with A ~ N(0,1)/sqrt(r), B = 0
    (reference: src/generators/lora.py:8-18)."""

    out_dim: int
    rank: int
    alpha: float = 1.0

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        a = self.param(
            "A",
            lambda key, shape: jax.random.normal(key, shape) / np.sqrt(self.rank),
            (in_dim, self.rank),
        )
        b = self.param("B", nn.initializers.zeros, (self.rank, self.out_dim))
        return self.alpha * ((x @ a.astype(x.dtype)) @ b.astype(x.dtype))


class Int8Dense(nn.Module):
    """Serving-only W8A8 Dense: params are the offline-quantized kernel
    (int8, per-output-channel ``scale``) produced by
    ``infer.loading.quantize_encoder``; activations quantize dynamically
    per row inside ``ops.quant.int8_matmul`` (MXU int8 runs 2x bf16 on
    v5e). Fresh init is never trained — the zeros kernel only exists so
    the module tree has a shape before the transform fills it."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        from ..ops.quant import int8_matmul

        k = x.shape[-1]
        kernel = self.param(
            "kernel", lambda key, shape: jnp.zeros(shape, jnp.int8),
            (k, self.features))
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,)) if self.use_bias else None
        return int8_matmul(x, kernel, scale, bias)


def _dense(cfg: ViTConfig, features: int, name: str, dtype,
           use_bias: bool = True):
    if cfg.quant == "int8":
        return Int8Dense(features, use_bias=use_bias, name=name)
    return nn.Dense(features, use_bias=use_bias, name=name, dtype=dtype)


class Attention(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        b, s, d = x.shape
        qkv = _dense(cfg, 3 * d, "qkv", x.dtype, use_bias=cfg.qkv_bias)(x)
        if cfg.attn_impl == "seq_shard":
            # whole-region serving: S sharded over the mesh's model axis,
            # each shard all-gathers k/v and runs the rectangular flash
            # kernel on its local q rows (parallel/seq.py; SURVEY §5)
            from ..parallel.seq import (current_seq_scope,
                                        seq_sharded_attention)

            mesh, axis = current_seq_scope()
            if cfg.lora_rank > 0:
                q, k, v = jnp.split(qkv, 3, axis=-1)
                q = q + LoRA(d, cfg.lora_rank, cfg.lora_alpha,
                             name="lora_q")(x)
                v = v + LoRA(d, cfg.lora_rank, cfg.lora_alpha,
                             name="lora_v")(x)
                out = seq_sharded_attention(q, k, v, num_heads=cfg.num_heads,
                                            mesh=mesh, axis=axis)
            else:
                out = seq_sharded_attention(qkv, num_heads=cfg.num_heads,
                                            mesh=mesh, axis=axis)
        elif cfg.lora_rank > 0:
            # adapters on the q and v slices of the fused qkv
            # (reference: src/generators/lora.py:21-33)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q + LoRA(d, cfg.lora_rank, cfg.lora_alpha, name="lora_q")(x)
            v = v + LoRA(d, cfg.lora_rank, cfg.lora_alpha, name="lora_v")(x)
            out = attention_bshd(q, k, v, cfg.num_heads, impl=cfg.attn_impl)
        else:
            # transpose-free path: the Pallas kernel reads the q/k/v
            # sections of the fused-qkv buffer in place — the splits (three
            # [B,S,H*D] copies per block) never materialize
            out = attention_qkv(qkv, cfg.num_heads, impl=cfg.attn_impl)
        return _dense(cfg, d, "proj", x.dtype)(out)


class _SwigluFc1(nn.Module):
    """fc1 with the packed value|gate halves and fused silu-gate.

    Same param layout and initializers as ``nn.Dense(2*hidden)`` so
    checkpoints are interchangeable; the compute goes through
    ``ops.mlp.swiglu_fc1`` (fused Pallas kernel on TPU — both halves are
    computed per output tile and only the gated product is stored, so the
    [M, 2H] intermediate never reaches HBM; XLA reference elsewhere)."""

    hidden: int
    impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], 2 * self.hidden))
        bias = self.param("bias", nn.initializers.zeros, (2 * self.hidden,))
        from ..ops.mlp import swiglu_fc1

        return swiglu_fc1(x, kernel, bias, impl=self.impl)


class Mlp(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        d = x.shape[-1]
        if cfg.mlp_type == "swiglu":
            # timm SwiGLUPacked / GluMlp(gate_last=False): fc1 packs value|gate
            # halves; silu(first) * second.
            if cfg.quant == "int8":
                x12 = Int8Dense(2 * cfg.mlp_hidden_dim, name="fc1")(x)
                x1, x2 = jnp.split(x12, 2, axis=-1)
                h = nn.silu(x1) * x2
            else:
                h = _SwigluFc1(cfg.mlp_hidden_dim, impl=cfg.mlp_impl,
                               name="fc1")(x)
        elif cfg.mlp_type == "gelu":
            h = _dense(cfg, cfg.mlp_hidden_dim, "fc1", x.dtype)(x)
            h = nn.gelu(h, approximate=False)
        else:
            raise ValueError(f"unknown mlp_type {cfg.mlp_type!r}")
        return _dense(cfg, d, "fc2", x.dtype)(h)


class Block(nn.Module):
    """One transformer block. The call signature is scan-compatible:
    ``block(x, None) -> (x, None)``."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, _=None):
        cfg = self.cfg

        def scaled(name, value):
            if cfg.init_values is None:
                return value
            gamma = self.param(
                name, nn.initializers.constant(cfg.init_values), (cfg.embed_dim,)
            )
            return value * gamma.astype(value.dtype)

        x = x + scaled(
            "ls1",
            Attention(cfg, name="attn")(
                nn.LayerNorm(epsilon=cfg.norm_eps, name="norm1", dtype=x.dtype)(x)
            ),
        )
        mlp_cls = Mlp
        if cfg.remat and cfg.remat_policy == "mlp_only":
            # sub-block remat (VisionTransformer leaves the Block itself
            # unremat'ed for this policy): attention residuals are saved,
            # only the MLP branch recomputes in the backward
            mlp_cls = nn.remat(Mlp, prevent_cse=False)
        x = x + scaled(
            "ls2",
            mlp_cls(cfg, name="mlp")(
                nn.LayerNorm(epsilon=cfg.norm_eps, name="norm2", dtype=x.dtype)(x)
            ),
        )
        # y = x so intermediate taps are available under nn.scan; jax DCE
        # prunes the stacked buffer whenever the caller ignores ys.
        return x, x


class VisionTransformer(nn.Module):
    """Returns the full token sequence after the final norm:
    [B, num_prefix_tokens + gh*gw, embed_dim].

    ``intermediates`` (static tuple of block indices) additionally returns
    the un-normed token sequence after those blocks (timm
    ``forward_intermediates(norm=False)`` parity, used by the UNETR
    pyramid encoder — reference: src/generators/unet.py:161-168).
    """

    cfg: ViTConfig
    intermediates: Optional[Tuple[int, ...]] = None

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, 3] (already normalized)
        cfg = self.cfg
        compute_dtype = jnp.dtype(cfg.dtype)
        x = x.astype(compute_dtype)
        p = cfg.patch_size
        x = nn.Conv(
            cfg.embed_dim, (p, p), strides=(p, p), padding="VALID",
            name="patch_embed", dtype=compute_dtype,
        )(x)
        b, gh, gw, d = x.shape
        x = x.reshape(b, gh * gw, d)

        prefix = []
        if cfg.class_token:
            cls = self.param("cls_token", nn.initializers.zeros, (1, 1, d))
            prefix.append(jnp.broadcast_to(cls.astype(x.dtype), (b, 1, d)))
        if cfg.reg_tokens:
            reg = self.param(
                "reg_token", nn.initializers.zeros, (1, cfg.reg_tokens, d)
            )
            prefix.append(jnp.broadcast_to(reg.astype(x.dtype), (b, cfg.reg_tokens, d)))

        if cfg.no_embed_class:
            # pos embed covers patch tokens only; prefix tokens get none
            # (timm no_embed_class semantics used by the reg4 dinov2 encoders)
            pos = self.param(
                "pos_embed", nn.initializers.normal(0.02), (1, gh * gw, d)
            )
            x = x + pos.astype(x.dtype)
            if prefix:
                x = jnp.concatenate(prefix + [x], axis=1)
        else:
            if prefix:
                x = jnp.concatenate(prefix + [x], axis=1)
            pos = self.param(
                "pos_embed",
                nn.initializers.normal(0.02),
                (1, cfg.num_prefix_tokens + gh * gw, d),
            )
            x = x + pos.astype(x.dtype)

        inter = []
        block_cls = Block
        if cfg.remat:
            if cfg.remat_policy == "dots":
                # selective remat: keep every dot_general output (qkv, proj,
                # fc1, fc2 — ~180 MB/block bf16 at B=16) so the backward
                # re-runs only the cheap elementwise chain instead of the
                # full block forward; trades ~7 GB HBM for one forward
                # recompute of the matmul path (measured in
                # scripts/profile_train_r3b.py)
                block_cls = nn.remat(
                    Block, prevent_cse=False,
                    policy=jax.checkpoint_policies.dots_saveable)
            elif cfg.remat_policy == "fc1":
                # save only the packed swiglu fc1 dot output
                # (ops/mlp.py::_swiglu_reference names it): ~2x less HBM
                # than "dots" (8192 of its 14848 elems/token) while
                # eliminating the single most expensive recompute; the
                # backward still re-runs qkv + the flash forward
                block_cls = nn.remat(
                    Block, prevent_cse=False,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "fc1_out"))
            elif cfg.remat_policy == "mlp_only":
                # remat the MLP branch only: attention residuals (qkv dot,
                # flash out + LSE) stay live, so the backward re-runs just
                # fc1 (Block wires this internally — see Block.__call__)
                pass
            else:
                block_cls = nn.remat(Block, prevent_cse=False)
        if cfg.scan_blocks:
            x, ys = nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,
                length=cfg.depth,
                unroll=min(cfg.scan_unroll, cfg.depth),
            )(cfg, name="blocks")(x, None)
            if self.intermediates:
                inter = [ys[i] for i in self.intermediates]
        else:
            for i in range(cfg.depth):
                x, _ = block_cls(cfg, name=f"blocks_{i}")(x, None)
                if self.intermediates and i in self.intermediates:
                    inter.append(x)

        x = nn.LayerNorm(epsilon=cfg.norm_eps, name="norm", dtype=x.dtype)(x)
        if self.intermediates:
            return x, inter
        return x
