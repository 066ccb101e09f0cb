"""Fused ViT attention sublayer: LN + qkv matmul + attention in one kernel.

The production chain (LayerNorm -> Dense(3HD) -> ops.attention.attention_qkv)
moves the normed activations and the fused-qkv buffer through HBM twice
each per block: LN writes [B,S,D] and the matmul reads it back; the matmul
writes [B,S,3HD] (194 MB at ViT-g B=64) and the attention kernel reads it
back. This kernel runs one program per batch item with the whole qkv
weight resident in VMEM (14 MB bf16 at ViT-g): it reads the raw residual
stream once, layer-norms it in VMEM, computes q|k|v for all heads with one
MXU pass, runs the per-head softmax-attention loop, and writes only the
[S, H*D] attention output. Neither intermediate ever reaches HBM.

Backward is XLA recompute from the raw input (custom_vjp) — the flagship
trains with LoRA adapters on q/v (which uses the unfused path), so the
fused kernel's backward only serves full-finetune configs.

Reference semantics: timm ViT block (src/generators/mipheivit.py via timm
VisionTransformer) — LN(eps) -> qkv -> per-head softmax(qk/sqrt(d))v.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_qkv_attn_kernel(x_ref, lns_ref, lnb_ref, w_ref, b_ref, o_ref,
                        qkv_ref, *, num_heads: int, head_dim: int,
                        eps: float):
    # x_ref: [1, S, D]; w_ref: [D, 3*H*Dh]; qkv_ref: VMEM scratch [S, 3*H*Dh]
    x = x_ref[0].astype(jnp.float32)                       # [S, D]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    normed = (x - mean) * jax.lax.rsqrt(var + eps)
    normed = normed * lns_ref[...].astype(jnp.float32) \
        + lnb_ref[...].astype(jnp.float32)
    normed = normed.astype(w_ref.dtype)

    qkv = jax.lax.dot_general(
        normed, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[...].astype(jnp.float32)
    qkv_ref[...] = qkv.astype(qkv_ref.dtype)

    hd = num_heads * head_dim
    scale = float(np.log2(np.e) / np.sqrt(head_dim))
    for g in range(num_heads):
        q = qkv_ref[:, g * head_dim:(g + 1) * head_dim]
        k = qkv_ref[:, hd + g * head_dim:hd + (g + 1) * head_dim]
        v = qkv_ref[:, 2 * hd + g * head_dim:2 * hd + (g + 1) * head_dim]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp2(logits - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, :, g * head_dim:(g + 1) * head_dim] = \
            (acc / l).astype(o_ref.dtype)


def _fused_forward(x, ln_scale, ln_bias, w, b, num_heads: int, eps: float,
                   interpret: bool):
    bsz, s, d = x.shape
    hd3 = w.shape[-1]
    hd = hd3 // 3
    head_dim = hd // num_heads
    kernel = functools.partial(_ln_qkv_attn_kernel, num_heads=num_heads,
                               head_dim=head_dim, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((d, hd3), lambda i: (0, 0)),
            pl.BlockSpec((1, hd3), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, hd), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, s, hd), x.dtype),
        scratch_shapes=[pltpu.VMEM((s, hd3), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, ln_scale.reshape(1, d), ln_bias.reshape(1, d), w, b.reshape(1, hd3))


def _chain_reference(x, ln_scale, ln_bias, w, b, num_heads: int, eps: float):
    """XLA fallback with identical semantics (f32 LN stats, f32 logits)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    normed = (normed * ln_scale + ln_bias).astype(x.dtype)
    qkv = normed @ w.astype(x.dtype) + b.astype(x.dtype)
    bsz, s, _ = x.shape
    hd = w.shape[-1] // 3
    head_dim = hd // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(bsz, s, num_heads, head_dim).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / np.sqrt(head_dim)
    p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    return out.transpose(0, 2, 1, 3).reshape(bsz, s, hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_ln_qkv_attn(x, ln_scale, ln_bias, w, b, num_heads: int,
                       eps: float, interpret: bool):
    return _fused_forward(x, ln_scale, ln_bias, w, b, num_heads, eps,
                          interpret)


def _fused_fwd_rule(x, ln_scale, ln_bias, w, b, num_heads, eps, interpret):
    out = _fused_forward(x, ln_scale, ln_bias, w, b, num_heads, eps,
                         interpret)
    return out, (x, ln_scale, ln_bias, w, b)


def _fused_bwd_rule(num_heads, eps, interpret, residuals, g):
    x, ln_scale, ln_bias, w, b = residuals
    _, vjp = jax.vjp(
        lambda *a: _chain_reference(*a, num_heads=num_heads, eps=eps),
        x, ln_scale, ln_bias, w, b)
    return vjp(g)


_fused_ln_qkv_attn.defvjp(_fused_fwd_rule, _fused_bwd_rule)


def ln_qkv_attention(x, ln_scale, ln_bias, w, b, num_heads: int,
                     eps: float = 1e-6, *, impl: str = "auto"):
    """LayerNorm -> fused-qkv projection -> multi-head attention, fused.

    x: [B, S, D]; w: [D, 3*H*Dh] (q|k|v packed); b: [3*H*Dh].
    Returns the attention output [B, S, H*Dh] (pre-proj).
    """
    d = x.shape[-1]
    hd = w.shape[-1] // 3
    head_dim = hd // num_heads
    on_tpu = jax.default_backend() == "tpu"
    # S % 8: the kernel's BlockSpec uses the full S as a block dim, so a
    # sublane-misaligned S (e.g. the flagship's 329) must not be routed to
    # Mosaic by the auto gate (explicit impl="pallas" still allowed for
    # experiments). ops/attention.py pads S instead; this fused block op
    # is only a profiling alternative.
    use_kernel = (
        impl in ("pallas", "pallas_interpret")
        or (impl == "auto" and on_tpu and x.shape[1] % 8 == 0)
    ) and head_dim % 8 == 0 and d % 128 == 0 and hd % 128 == 0 \
        and 8 <= x.shape[1] <= 1024
    if not use_kernel:
        return _chain_reference(x, ln_scale, ln_bias, w, b, num_heads, eps)
    interpret = impl == "pallas_interpret" or not on_tpu
    return _fused_ln_qkv_attn(x, ln_scale, ln_bias, w, b, num_heads, eps,
                              interpret)
