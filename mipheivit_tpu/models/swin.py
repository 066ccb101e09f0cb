"""Swin Transformer (timm-layout) for ctranspath and the HEMIT dual branch.

Reference uses timm ``swin_tiny_patch4_window7_224`` both as the ctranspath
foundation encoder (with a conv stem — src/generators/foundation_models.py:
161-184, 321-367) and as the HEMIT SwinT branch
(src/generators/hemit_models.py:1097-1112). This implementation keeps
timm's module layout (stages with downsample-first, window attention with
relative position bias, patch merging) so checkpoints import key-for-key,
and supports LoRA(q,v) like the ViT (src/generators/lora.py:60-63).

TPU notes: window partitioning is pure reshape/transpose (no gathers);
shifted windows use jnp.roll; the shift attention mask and the relative
position index are precomputed in numpy at trace time (static shapes).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .vit import LoRA


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    img_size: Tuple[int, int] = (224, 224)
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    conv_stem: bool = False      # ctranspath ConvStem variant
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: str = "float32"

    @property
    def num_stages(self):
        return len(self.depths)

    def stage_dim(self, i):
        return self.embed_dim * (2 ** i)


def _rel_pos_index(window: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """[nW, w*w, w*w] additive mask for shifted-window attention."""
    img_mask = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img_mask[hs, ws] = cnt
            cnt += 1
    m = img_mask.reshape(hp // window, window, wp // window, window)
    m = m.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int
    qkv_bias: bool = True
    lora_rank: int = 0
    lora_alpha: float = 1.0

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        # x: [B_windows, N, C]
        bw, n, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, name="qkv",
                       dtype=x.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self.lora_rank > 0:
            q = q + LoRA(self.dim, self.lora_rank, self.lora_alpha,
                         name="lora_q")(x)
            v = v + LoRA(self.dim, self.lora_rank, self.lora_alpha,
                         name="lora_v")(x)

        def heads(t):
            return t.reshape(bw, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / np.sqrt(head_dim)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * self.window - 1) ** 2, self.num_heads))
        index = jnp.asarray(_rel_pos_index(self.window).reshape(-1))
        bias = table[index].reshape(n, n, self.num_heads).transpose(2, 0, 1)
        logits = logits + bias[None].astype(logits.dtype)
        if mask is not None:
            nw = mask.shape[0]
            logits = logits.reshape(bw // nw, nw, self.num_heads, n, n)
            logits = logits + mask[None, :, None].astype(logits.dtype)
            logits = logits.reshape(bw, self.num_heads, n, n)
        attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
        return nn.Dense(self.dim, name="proj", dtype=x.dtype)(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float
    qkv_bias: bool
    lora_rank: int = 0
    lora_alpha: float = 1.0

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, C]
        b, h, w, c = x.shape
        win = min(self.window, h, w)
        # timm gate (SwinTransformerBlock._calc_window_shift / the older
        # "if min(input_resolution) <= window_size: shift_size = 0"): a
        # stage whose grid fits in one window never shifts — e.g.
        # swin-tiny stage 3 (grid 7 = window 7) runs plain W-MSA on both
        # blocks. Shifting there would double-count the single window
        # through the roll+mask path and break checkpoint parity.
        shift = self.shift if min(h, w) > win else 0
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=x.dtype)(x)
        pad_h = (win - h % win) % win
        pad_w = (win - w % win) % win
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, win, shift))
        else:
            mask = None
        # partition windows
        x = x.reshape(b, hp // win, win, wp // win, win, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)
        x = WindowAttention(c, self.num_heads, win, self.qkv_bias,
                            self.lora_rank, self.lora_alpha, name="attn")(
            x, mask)
        x = x.reshape(b, hp // win, wp // win, win, win, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :h, :w]
        x = shortcut + x

        y = nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=x.dtype)(x)
        hidden = int(self.dim * self.mlp_ratio)
        y = nn.Dense(hidden, name="mlp_fc1", dtype=x.dtype)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp_fc2", dtype=x.dtype)(y)
        return x + y


class PatchMerging(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        # timm order: [x(0::2,0::2), x(1::2,0::2), x(0::2,1::2), x(1::2,1::2)]
        x = jnp.concatenate(
            [x[:, :, 0, :, 0], x[:, :, 1, :, 0],
             x[:, :, 0, :, 1], x[:, :, 1, :, 1]], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, name="norm", dtype=x.dtype)(x)
        return nn.Dense(self.out_dim, use_bias=False, name="reduction",
                        dtype=x.dtype)(x)


class ConvStemEmbed(nn.Module):
    """ctranspath conv stem (reference: foundation_models.py:321-367)."""

    embed_dim: int

    @nn.compact
    def __call__(self, x):
        dim = self.embed_dim // 8
        for i in range(2):
            x = nn.Conv(dim, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        use_bias=False, name=f"conv{i}", dtype=x.dtype)(x)
            x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i}", dtype=x.dtype)(x)
            x = nn.relu(x)
            dim *= 2
        x = nn.Conv(self.embed_dim, (1, 1), name="proj", dtype=x.dtype)(x)
        return nn.LayerNorm(epsilon=1e-5, name="norm", dtype=x.dtype)(x)


class SwinTransformer(nn.Module):
    """Returns per-stage NHWC features; ``features_only``-style output.

    ``stage_features='post_downsample'`` matches the HEMIT tap points
    (after each stage's downsample, before its blocks —
    hemit_models.py:1203-1210); 'stage_out' matches timm
    forward_intermediates (after blocks).
    """

    cfg: SwinConfig

    @nn.compact
    def __call__(self, x, collect: str = "stage_out"):
        cfg = self.cfg
        x = x.astype(jnp.dtype(cfg.dtype))
        if cfg.conv_stem:
            x = ConvStemEmbed(cfg.embed_dim, name="patch_embed")(x)
        else:
            p = cfg.patch_size
            x = nn.Conv(cfg.embed_dim, (p, p), strides=(p, p),
                        padding="VALID", name="patch_embed", dtype=x.dtype)(x)
            x = nn.LayerNorm(epsilon=1e-5, name="patch_norm", dtype=x.dtype)(x)

        feats = []
        for si, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
            dim = cfg.stage_dim(si)
            if si > 0:
                x = PatchMerging(dim, name=f"downsample{si}")(x)
                if collect == "post_downsample":
                    feats.append(x)
            for bi in range(depth):
                shift = 0 if bi % 2 == 0 else cfg.window_size // 2
                x = SwinBlock(dim, heads, cfg.window_size, shift,
                              cfg.mlp_ratio, cfg.qkv_bias, cfg.lora_rank,
                              cfg.lora_alpha,
                              name=f"layers{si}_blocks{bi}")(x)
            if collect == "stage_out":
                feats.append(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm", dtype=x.dtype)(x)
        return x, feats
