"""Multi-head attention for the ViT encoder: Pallas flash kernel + XLA fallback.

The reference runs timm's eager attention (materializes [B,H,S,S] probs) on
cuDNN (reference: src/generators/mipheivit.py via timm VisionTransformer).
Here the forward is a Pallas TPU kernel with online softmax — logits never
leave VMEM — and the backward is an XLA recompute-from-LSE pass at ViT
sequence lengths (cheap, and XLA fuses it well) or Pallas block-recompute
kernels (dK/dV then dQ, probs rebuilt from the saved LSE) for long
sequences, so whole-region training never materializes [B,H,S,S]. Sequence length is padded to a
lane-aligned multiple of 128 inside the op; padded keys are masked with -inf
so callers see exact softmax semantics at any S (e.g. 329 = 18x18 patches +
1 cls + 4 reg tokens for H-Optimus-0 at 256px).

Layout: [B, H, S, D] with D the per-head dim (64 for ViT-g). f32 accumulation
everywhere; inputs may be bf16.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_MAX_BLOCK = 512


def _pick_block(s_pad: int) -> int:
    """Largest multiple of 128 that divides s_pad, capped at _MAX_BLOCK.
    ViT-scale sequences (<=512 after padding) run one whole-sequence block
    per (batch*head) program — the online-softmax loop degenerates to a
    single fused pass and DMA granularity stays large."""
    best = 128
    for cand in range(128, _MAX_BLOCK + 1, 128):
        if s_pad % cand == 0:
            best = cand
    return best


def _attn_reference(q, k, v, seq_len: int):
    """Plain XLA attention (used as fallback and inside the backward)."""
    s = q.shape[-2]
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if seq_len < s:
        mask = jnp.arange(s) < seq_len
        logits = jnp.where(mask[None, None, None, :], logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                  acc_ref, m_ref, l_ref, *, seq_len: int, kv_steps: int,
                  block_k: int):
    """One (batch*head, q-block) program; kv-block loop is the last grid dim.
    Emits the log-sum-exp rows so the Pallas backward can recompute probs
    block-by-block without an [S,S] intermediate."""
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32)          # [BLK_Q, D]
    k = k_ref[0].astype(jnp.float32)          # [BLK_K, D]
    v = v_ref[0].astype(jnp.float32)          # [BLK_K, D]
    scale = 1.0 / np.sqrt(q.shape[-1])

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                  # [BLK_Q, BLK_K]

    # Mask keys beyond the true sequence length (static padding mask).
    key_pos = kv_idx * block_k + jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, dimension=1
    )
    logits = jnp.where(key_pos < seq_len, logits, _NEG_INF)

    m_prev = m_ref[:]                          # [BLK_Q, 1]
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)                # [BLK_Q, BLK_K]

    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = m_new
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(kv_idx == kv_steps - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)
        # lse rides as [bh, S, 1] (lane dim 1 == full array dim) — a 2-D
        # [bh, S] row output with block (1, BLK) is rejected by Mosaic's
        # (8, 128) block-divisibility rule on real TPUs.
        lse_ref[0] = m_ref[:] + jnp.log(l_ref[:])


def _short_kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len: int, group: int):
    """Whole-sequence attention for ``group`` (batch*head) pairs per program.

    At ViT scale (S_pad <= 512) the full [S,S] logits tile fits VMEM, so no
    online softmax is needed: one exact softmax pass per head. Packing
    ``group`` heads per program keeps DMA granularity high (d=64 blocks are
    half a lane-width) and amortizes grid overhead; both matmuls run in
    native bf16 with f32 accumulation, probs are cast to the value dtype
    exactly like the XLA reference path."""
    for g in range(group):
        q = q_ref[g]                              # [S, D] input dtype
        k = k_ref[g]
        scale = 1.0 / float(np.sqrt(q.shape[-1]))
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                                  # [S, S] f32
        key_pos = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(key_pos < seq_len, logits, _NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(v_ref.dtype)            # bf16 probs (XLA parity)
        o_ref[g] = jax.lax.dot_general(
            p, v_ref[g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _short_forward(q, k, v, seq_len: int, interpret: bool):
    b, h, s, d = q.shape
    bh = b * h
    group = 1
    for cand in (16, 8, 4, 2):
        if bh % cand == 0:
            group = cand
            break
    kernel = functools.partial(_short_kernel, seq_len=seq_len, group=group)
    out = pl.pallas_call(
        kernel,
        grid=(bh // group,),
        in_specs=[
            pl.BlockSpec((group, s, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((group, s, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((group, s, d), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((group, s, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(q.reshape(bh, s, d), k.reshape(bh, s, d), v.reshape(bh, s, d))
    return out.reshape(b, h, s, d)


def _long_forward(q, k, v, seq_len: int, interpret: bool):
    """Online-softmax forward for S > _MAX_BLOCK; also returns LSE rows."""
    b, h, s, d = q.shape
    bh = b * h
    qf = q.reshape(bh, s, d)
    kf = k.reshape(bh, s, d)
    vf = v.reshape(bh, s, d)
    block = _pick_block(s)
    q_steps = s // block
    kv_steps = s // block

    kernel = functools.partial(_flash_kernel, seq_len=seq_len,
                               kv_steps=kv_steps, block_k=block)
    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, q_steps, kv_steps),
        in_specs=[
            pl.BlockSpec((1, block, d), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, block, d), lambda g, i, j: (g, j, 0)),
            pl.BlockSpec((1, block, d), lambda g, i, j: (g, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block, d), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, block, 1), lambda g, i, j: (g, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s, d), q.dtype),
            jax.ShapeDtypeStruct((bh, s, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, d), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, s, d), lse


def _flash_forward(q, k, v, seq_len: int, interpret: bool):
    if q.shape[-2] <= _MAX_BLOCK:
        return _short_forward(q, k, v, seq_len, interpret)
    return _long_forward(q, k, v, seq_len, interpret)[0]


def flash_cross_attention(q, k, v, seq_len_k: int | None = None, *,
                          interpret: bool | None = None):
    """Rectangular flash attention: q [B,H,Sq,D] over k/v [B,H,Sk,D].

    The seq-sharded whole-region path (``parallel.seq``) calls this with
    the local q shard and the all-gathered full k/v — same online-softmax
    kernel as ``_long_forward``, just a non-square grid. Both lengths are
    padded to 128 multiples internally; ``seq_len_k`` masks padded keys.

    Differentiable: the backward is an XLA recompute-from-LSE pass
    (rectangular [Sq,Sk] probs in f32 — at sharded training scale
    Sq = S/n_shards so the block is bandwidth-cheap), which makes
    seq-sharded whole-region *training* work through ``jax.shard_map``
    AD: the k/v all-gather transposes to a reduce-scatter of dK/dV
    automatically.
    """
    b, h, sq, d = q.shape
    sk = k.shape[-2]
    seq_len_k = sk if seq_len_k is None else seq_len_k
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _cross_attention(q, k, v, seq_len_k, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _cross_attention(q, k, v, seq_len_k: int, interpret: bool):
    return _cross_forward(q, k, v, seq_len_k, interpret)[0]


def _cross_fwd_rule(q, k, v, seq_len_k, interpret):
    out, lse = _cross_forward(q, k, v, seq_len_k, interpret)
    return out, (q, k, v, out, lse)


def _cross_bwd_rule(seq_len_k, interpret, residuals, g):
    q, k, v, out, lse = residuals
    d = q.shape[-1]
    scale = 1.0 / float(np.sqrt(d))
    qf, kf, vf = (t.astype(jnp.float32) for t in (q, k, v))
    gf, of = g.astype(jnp.float32), out.astype(jnp.float32)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qf, kf,
                        preferred_element_type=jnp.float32) * scale
    if seq_len_k < k.shape[-2]:
        mask = jnp.arange(k.shape[-2]) < seq_len_k
        logits = jnp.where(mask[None, None, None, :], logits, _NEG_INF)
    p = jnp.exp(logits - lse[..., None])
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, vf)
    delta = jnp.sum(gf * of, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf)
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_cross_attention.defvjp(_cross_fwd_rule, _cross_bwd_rule)


def _cross_forward(q, k, v, seq_len_k: int, interpret: bool):
    b, h, sq, d = q.shape
    sk = k.shape[-2]
    sq_pad = ((sq + 127) // 128) * 128
    sk_pad = ((sk + 127) // 128) * 128
    qp = _pad_to(q, sq_pad)
    kp, vp = _pad_to(k, sk_pad), _pad_to(v, sk_pad)
    bh = b * h
    qf = qp.reshape(bh, sq_pad, d)
    kf = kp.reshape(bh, sk_pad, d)
    vf = vp.reshape(bh, sk_pad, d)
    block_q = _pick_block(sq_pad)
    block_k = _pick_block(sk_pad)
    kv_steps = sk_pad // block_k

    kernel = functools.partial(_flash_kernel, seq_len=seq_len_k,
                               kv_steps=kv_steps, block_k=block_k)
    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, sq_pad // block_q, kv_steps),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda g, i, j: (g, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sq_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return (out.reshape(b, h, sq_pad, d)[..., :sq, :],
            lse.reshape(b, h, sq_pad)[..., :sq])


def _bwd_dkdv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                     dk_ref, dv_ref, dk_acc, dv_acc, *, seq_len: int,
                     q_steps: int, block_k: int, scale: float):
    """Grid (bh, kv_block, q_block): accumulate dK/dV for one kv block over
    all q blocks. Probs are recomputed per block pair from the saved LSE —
    the [S,S] matrix never exists."""
    q_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0].astype(jnp.float32)           # [BLK_Q, D]
    k = k_ref[0].astype(jnp.float32)           # [BLK_K, D]
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)         # [BLK_Q, D]
    lse = lse_ref[0]                           # [BLK_Q, 1]
    delta = delta_ref[0]                       # [BLK_Q, 1]

    s_ij = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                   # [BLK_Q, BLK_K]
    key_pos = pl.program_id(1) * block_k + jax.lax.broadcasted_iota(
        jnp.int32, s_ij.shape, dimension=1)
    s_ij = jnp.where(key_pos < seq_len, s_ij, _NEG_INF)
    p = jnp.exp(s_ij - lse)                     # [BLK_Q, BLK_K]

    dv_acc[:] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * scale
    dk_acc[:] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(q_idx == q_steps - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, dq_acc, *, seq_len: int, kv_steps: int,
                   block_k: int, scale: float):
    """Grid (bh, q_block, kv_block): accumulate dQ for one q block."""
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]
    delta = delta_ref[0]

    s_ij = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    key_pos = kv_idx * block_k + jax.lax.broadcasted_iota(
        jnp.int32, s_ij.shape, dimension=1)
    s_ij = jnp.where(key_pos < seq_len, s_ij, _NEG_INF)
    p = jnp.exp(s_ij - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * scale
    dq_acc[:] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(kv_idx == kv_steps - 1)
    def _finalize():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _long_backward(q, k, v, out, lse, g, seq_len: int, interpret: bool):
    b, h, s, d = q.shape
    bh = b * h
    block = _pick_block(s)
    steps = s // block
    scale = 1.0 / float(np.sqrt(d))
    qf, kf, vf, gf = (t.reshape(bh, s, d) for t in (q, k, v, g))
    # delta = rowsum(dO * O): one fused elementwise pass in XLA.
    # lse/delta ride as [bh, S, 1] (see _flash_kernel._finalize).
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1).reshape(bh, s, 1)

    qkv_spec = pl.BlockSpec((1, block, d), lambda gidx, i, j: (gidx, j, 0))
    row_spec = pl.BlockSpec((1, block, 1), lambda gidx, i, j: (gidx, j, 0))
    kv_spec = pl.BlockSpec((1, block, d), lambda gidx, i, j: (gidx, i, 0))

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkdv_kernel, seq_len=seq_len, q_steps=steps,
                          block_k=block, scale=scale),
        grid=(bh, steps, steps),
        in_specs=[qkv_spec, kv_spec, kv_spec, qkv_spec, row_spec, row_spec],
        out_specs=[kv_spec, kv_spec],
        out_shape=[jax.ShapeDtypeStruct((bh, s, d), k.dtype),
                   jax.ShapeDtypeStruct((bh, s, d), v.dtype)],
        scratch_shapes=[pltpu.VMEM((block, d), jnp.float32),
                        pltpu.VMEM((block, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qf, kf, vf, gf, lse, delta)

    q_spec = pl.BlockSpec((1, block, d), lambda gidx, i, j: (gidx, i, 0))
    qrow_spec = pl.BlockSpec((1, block, 1), lambda gidx, i, j: (gidx, i, 0))
    kvj_spec = pl.BlockSpec((1, block, d), lambda gidx, i, j: (gidx, j, 0))
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, seq_len=seq_len, kv_steps=steps,
                          block_k=block, scale=scale),
        grid=(bh, steps, steps),
        in_specs=[q_spec, kvj_spec, kvj_spec, q_spec, qrow_spec, qrow_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qf, kf, vf, gf, lse, delta)
    shape = (b, h, s, d)
    return dq.reshape(shape), dk.reshape(shape), dv.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_attention(q, k, v, seq_len: int, interpret: bool):
    return _flash_forward(q, k, v, seq_len, interpret)


def _flash_fwd_rule(q, k, v, seq_len, interpret):
    if q.shape[-2] <= _MAX_BLOCK:
        out = _short_forward(q, k, v, seq_len, interpret)
        return out, (q, k, v, out, None)
    out, lse = _long_forward(q, k, v, seq_len, interpret)
    return out, (q, k, v, out, lse)


def _flash_bwd_rule(seq_len, interpret, residuals, g):
    """Backward: XLA recompute at ViT sequence lengths (the [S,S] block is
    small and fuses); the Pallas block-recompute kernels above for long
    sequences, where an [S,S] intermediate would be tens of GB (21k-token
    whole-region training)."""
    q, k, v, out, lse = residuals
    if lse is not None:
        return _long_backward(q, k, v, out, lse, g, seq_len, interpret)
    s = q.shape[-2]
    scale = 1.0 / np.sqrt(q.shape[-1])
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    of = out.astype(jnp.float32)

    logits = jnp.einsum("bhqd,bhkd->bhqk", qf, kf,
                        preferred_element_type=jnp.float32) * scale
    if seq_len < s:
        mask = jnp.arange(s) < seq_len
        logits = jnp.where(mask[None, None, None, :], logits, _NEG_INF)
    lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - lse)                                # softmax probs
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, vf)
    delta = jnp.sum(gf * of, axis=-1, keepdims=True)         # rowsum(dO*O)
    ds = p * (dp - delta) * scale
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf)
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def _pad_to(x, s_pad):
    pad = s_pad - x.shape[-2]
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))


# ---------------------------------------------------------------------------
# Transpose-free short-sequence path: q/k/v in [B, S, H*D] (the natural
# layout coming out of the fused qkv matmul). At ViT scale the [B,H,S,D]
# transposes around attention cost more HBM traffic than the attention
# matmuls themselves; this kernel reads head slices straight out of the
# lane dimension (blocks of heads_per_block*D lanes, 128-aligned for D=64)
# and writes the output back in [B, S, H*D], so the surrounding qkv/proj
# matmuls see zero layout ops.
# ---------------------------------------------------------------------------


def _pick_heads_per_block(num_heads: int, s: int, d: int) -> int:
    """Head group size per kernel program (hpb=12 at the ViT-g shape).

    Re-swept under the raised 64 MB scoped-VMEM cap (r3,
    scripts/profile_attn_r3{,b}.py): the cap raise alone brought the
    production kernel 1.27 -> ~0.85 ms/block, and hpb=24 / direct-store
    hpb=12 measure statistically tied with it — so the 2 MB block budget
    below (which lands on hpb=12) stays, now as the *measured* optimum
    rather than a VMEM-rejection workaround.

    r5 re-sweep (scripts/profile_attn_r3b.py on-chip log
    logs/chip_r4/attn_batchpack.log): direct-store hpb=24 measured 1.003
    ms/block vs 1.056 production — MIPHEI_ATTN_HPB overrides the budget
    pick for the in-model trial."""
    env = os.environ.get("MIPHEI_ATTN_HPB")
    if env:
        cand = int(env)
        if num_heads % cand == 0:
            return cand
    budget = 2 * 1024 * 1024
    for cand in range(num_heads, 0, -1):
        if num_heads % cand == 0 and 4 * s * cand * d * 2 <= budget:
            return cand
    return 1


def _bshd_kernel(q_ref, k_ref, v_ref, o_ref, *, head_dim: int,
                 heads_per_block: int):
    outs = []
    # fold softmax's 1/sqrt(d) and exp->exp2 conversion into one scale:
    # exp(x*s - m) == exp2(x*s' - m') with s' = s*log2(e); exp2 is the
    # cheaper VPU primitive and the max-shift stays exact.
    scale = float(np.log2(np.e) / np.sqrt(head_dim))
    for g in range(heads_per_block):
        sl = slice(g * head_dim, (g + 1) * head_dim)
        q = q_ref[0][:, sl]                        # [S, D]
        k = k_ref[0][:, sl]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                                   # [S, S] f32 (log2 units)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp2(logits - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        # normalize the [S, D] output instead of the [S, S] probs: one
        # cheap column pass replaces an S^2 divide (numerically identical
        # to f32 division tolerance)
        acc = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0][:, sl],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        outs.append(acc / l)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _bshd_kernel_staged(q_ref, k_ref, v_ref, o_ref, *, head_dim: int,
                        heads_per_block: int):
    """Same math as ``_bshd_kernel``, emission reordered into three waves
    (all qk dots -> all softmaxes -> all pv dots). The per-head chains are
    independent either way; this probes whether Mosaic's scheduler keeps
    the MXU busier when the dots are adjacent in emission order
    (r4 sweep: scripts/profile_attn_r4.py)."""
    scale = float(np.log2(np.e) / np.sqrt(head_dim))
    sls = [slice(g * head_dim, (g + 1) * head_dim)
           for g in range(heads_per_block)]
    logits = [jax.lax.dot_general(
        q_ref[0][:, sl], k_ref[0][:, sl], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale for sl in sls]
    probs = []
    for lg in logits:
        m = jnp.max(lg, axis=-1, keepdims=True)
        p = jnp.exp2(lg - m)
        probs.append((p.astype(v_ref.dtype),
                      jnp.sum(p, axis=-1, keepdims=True)))
    outs = [jax.lax.dot_general(
        p, v_ref[0][:, sl], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) / l
        for (p, l), sl in zip(probs, sls)]
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _bshd_kernel_paired(q_ref, k_ref, v_ref, o_ref, *, head_dim: int,
                        heads_per_block: int):
    """Head-*pair* packing (VERDICT r3 #2): both matmuls of two heads fold
    into single full-depth MXU contractions via block-diagonal operands.

    qk: [S, 2D] x [2S, 2D]^T with K2 = [[k_g | 0], [0 | k_g1]] gives the
    two heads' logits side by side in one K=128 contraction; pv:
    [S, 2S] x [2S, 2D] with V2 = [[v_g | 0], [0 | v_g1]]. Issued FLOPs
    double (the zero blocks compute nothing useful) while contraction
    depth doubles — cycle-neutral on the systolic array in theory; this
    variant measures whether fewer, larger dots pipeline better than the
    d=64 pairs in practice."""
    s = q_ref.shape[1]
    scale = float(np.log2(np.e) / np.sqrt(head_dim))
    dtype = v_ref.dtype
    outs = []
    for g in range(0, heads_per_block, 2):
        sl2 = slice(g * head_dim, (g + 2) * head_dim)
        q2 = q_ref[0][:, sl2]                        # [S, 2D]
        k2 = k_ref[0][:, sl2]
        v2 = v_ref[0][:, sl2]
        zeros = jnp.zeros((s, head_dim), dtype)
        k_bd = jnp.concatenate([
            jnp.concatenate([k2[:, :head_dim], zeros], axis=1),
            jnp.concatenate([zeros, k2[:, head_dim:]], axis=1)], axis=0)
        logits = jax.lax.dot_general(
            q2, k_bd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [S, 2S]
        # per-head softmax over each S-column half
        la, lb = logits[:, :s], logits[:, s:]
        pa = jnp.exp2(la - jnp.max(la, axis=-1, keepdims=True))
        pb = jnp.exp2(lb - jnp.max(lb, axis=-1, keepdims=True))
        l_a = jnp.sum(pa, axis=-1, keepdims=True)
        l_b = jnp.sum(pb, axis=-1, keepdims=True)
        p2 = jnp.concatenate([pa, pb], axis=1).astype(dtype)  # [S, 2S]
        v_bd = jnp.concatenate([
            jnp.concatenate([v2[:, :head_dim], zeros], axis=1),
            jnp.concatenate([zeros, v2[:, head_dim:]], axis=1)], axis=0)
        acc = jax.lax.dot_general(
            p2, v_bd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [S, 2D]
        outs.append(jnp.concatenate(
            [acc[:, :head_dim] / l_a, acc[:, head_dim:] / l_b], axis=1))
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


_BSHD_KERNELS = {
    "interleaved": _bshd_kernel,
    "staged": _bshd_kernel_staged,
    "paired_bd": _bshd_kernel_paired,
}


def _resolve_bshd_kernel(hpb: int):
    """Kernel emission variant, env-switchable for the on-chip sweep
    (MIPHEI_ATTN_VARIANT=interleaved|staged|paired_bd). Production default
    is the measured r3 optimum; change only with numbers. paired_bd needs
    an even head group and falls back to production otherwise."""

    # r5 on-chip sweep (logs/chip_r4/attn_variants.log): staged 1.377 vs
    # interleaved 1.446 vs paired_bd 1.765 ms/B64-block; flagship e2e
    # 357.1 / 362.9 / 370.6 ms — staged is the measured production default
    variant = os.environ.get("MIPHEI_ATTN_VARIANT", "staged")
    if variant not in _BSHD_KERNELS:
        raise ValueError(
            f"MIPHEI_ATTN_VARIANT={variant!r} unknown; options: "
            f"{sorted(_BSHD_KERNELS)}")
    if variant == "paired_bd" and hpb % 2:
        variant = "interleaved"
    return _BSHD_KERNELS[variant]


def _bshd_forward(q, k, v, num_heads: int, interpret: bool):
    b, s, hd = q.shape
    d = hd // num_heads
    hpb = _pick_heads_per_block(num_heads, s, d)
    kernel = functools.partial(_resolve_bshd_kernel(hpb), head_dim=d,
                               heads_per_block=hpb)
    return pl.pallas_call(
        kernel,
        grid=(b, num_heads // hpb),
        in_specs=[
            pl.BlockSpec((1, s, hpb * d), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, s, hpb * d), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, s, hpb * d), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, s, hpb * d), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, s, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _bshd_attention(q, k, v, num_heads: int, interpret: bool):
    return _bshd_forward(q, k, v, num_heads, interpret)


def _bshd_fwd_rule(q, k, v, num_heads, interpret):
    out = _bshd_forward(q, k, v, num_heads, interpret)
    return out, (q, k, v, out)


def _bshd_bwd_rule(num_heads, interpret, residuals, g):
    """XLA recompute backward in the [B, S, H, D] layout (no transposes to
    or from [B,H,S,D]; XLA folds the head axis into the einsums)."""
    q, k, v, out = residuals
    b, s, hd = q.shape
    d = hd // num_heads
    scale = 1.0 / float(np.sqrt(d))

    def split(t):
        return t.reshape(b, s, num_heads, d).astype(jnp.float32)

    qf, kf, vf, gf, of = (split(t) for t in (q, k, v, g, out))
    logits = jnp.einsum("bqhd,bkhd->bhqk", qf, kf,
                        preferred_element_type=jnp.float32) * scale
    lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - lse)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, gf)
    dp = jnp.einsum("bqhd,bkhd->bhqk", gf, vf)
    delta = jnp.einsum("bqhd,bqhd->bhq", gf, of)[..., None]
    ds = p * (dp - delta) * scale
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kf)
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, qf)
    return (dq.reshape(b, s, hd).astype(q.dtype),
            dk.reshape(b, s, hd).astype(k.dtype),
            dv.reshape(b, s, hd).astype(v.dtype))


_bshd_attention.defvjp(_bshd_fwd_rule, _bshd_bwd_rule)


def _qkv_forward(qkv, num_heads: int, interpret: bool):
    """BSHD kernel fed straight from the fused-qkv buffer [B, S, 3*H*D].

    ``jnp.split(qkv, 3)`` before a pallas_call forces XLA to materialize
    three [B,S,H*D] copies (the kernel's operands must be whole arrays) —
    ~0.4 GB of pure HBM traffic per ViT-g block at B=64. Instead the one
    qkv buffer is passed three times with block index maps offset into the
    q/k/v sections, so the DMA engine reads each slice in place and the
    splits never exist.
    """
    b, s, hd3 = qkv.shape
    hd = hd3 // 3
    d = hd // num_heads
    hpb = _pick_heads_per_block(num_heads, s, d)
    nblk = num_heads // hpb
    kernel = functools.partial(_resolve_bshd_kernel(hpb), head_dim=d,
                               heads_per_block=hpb)

    def spec(section):
        return pl.BlockSpec(
            (1, s, hpb * d),
            lambda i, j, section=section: (i, 0, j + section * nblk))

    out = pl.pallas_call(
        kernel,
        grid=(b, nblk),
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=pl.BlockSpec((1, s, hpb * d), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, s, hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # Mosaic's default 16 MB scoped-VMEM cap both rejects hpb>=24
            # and pessimizes buffering at hpb=12 (measured -23% kernel
            # time with the cap raised; v5e has 128 MB physical VMEM)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qkv, qkv, qkv)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _qkv_attention(qkv, num_heads: int, interpret: bool):
    return _qkv_forward(qkv, num_heads, interpret)


def _qkv_fwd_rule(qkv, num_heads, interpret):
    out = _qkv_forward(qkv, num_heads, interpret)
    return out, (qkv, out)


def _qkv_bwd_rule(num_heads, interpret, residuals, g):
    qkv, out = residuals
    q, k, v = jnp.split(qkv, 3, axis=-1)
    dq, dk, dv = _bshd_bwd_rule(num_heads, interpret, (q, k, v, out), g)
    return (jnp.concatenate([dq, dk, dv], axis=-1),)


_qkv_attention.defvjp(_qkv_fwd_rule, _qkv_bwd_rule)


def attention_qkv(qkv, num_heads: int, *, impl: str = "auto"):
    """Attention straight off the fused-qkv projection output.

    ``qkv``: [B, S, 3*H*D] laid out as the q | k | v sections of a fused
    Dense(3*H*D). Equivalent to splitting and calling ``attention_bshd``,
    but on TPU the kernel reads the sections in place — no split copies.
    """
    b, s, hd3 = qkv.shape
    hd = hd3 // 3
    d = hd // num_heads
    on_tpu = jax.default_backend() == "tpu"
    # the in-place section reads are blocked specs over the 3x-wide fused
    # buffer, so Mosaic requires the block width (hpb*d) to be a multiple
    # of 128 lanes (it can never equal the full 3*H*D array width); small
    # models fall back to the split path, whose blocks can span the array
    hpb = _pick_heads_per_block(num_heads, s, d)
    use_kernel = (
        impl in ("flash", "flash_interpret")
        or (impl == "auto" and on_tpu)
    ) and (d % 8 == 0) and 8 <= s <= _MAX_BLOCK and (hpb * d) % 128 == 0
    if use_kernel:
        interpret = impl == "flash_interpret" or not on_tpu
        return _qkv_attention(qkv, num_heads, interpret)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    return attention_bshd(q, k, v, num_heads, impl=impl)


def attention_bshd(q, k, v, num_heads: int, *, impl: str = "auto"):
    """Attention over the fused-qkv layout: q/k/v [B, S, H*D] -> [B, S, H*D].

    The fast path (TPU, S small enough for whole-sequence VMEM softmax) runs
    the transpose-free Pallas kernel; otherwise falls back to
    ``dot_product_attention`` with explicit head transposes.
    """
    b, s, hd = q.shape
    d = hd // num_heads
    on_tpu = jax.default_backend() == "tpu"
    hpb = _pick_heads_per_block(num_heads, s, d)
    use_kernel = (
        impl in ("flash", "flash_interpret")
        or (impl == "auto" and on_tpu)
    ) and (d % 8 == 0) and 8 <= s <= _MAX_BLOCK \
        and ((hpb * d) % 128 == 0 or hpb == num_heads)
    if use_kernel:
        interpret = impl == "flash_interpret" or not on_tpu
        return _bshd_attention(q, k, v, num_heads, interpret)

    def heads(t):
        return t.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)

    out = dot_product_attention(heads(q), heads(k), heads(v), impl=impl)
    return out.transpose(0, 2, 1, 3).reshape(b, s, hd)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    impl: str = "auto",
) -> jnp.ndarray:
    """Scaled dot-product attention over [B, H, S, D].

    impl: "flash" (Pallas TPU kernel), "xla" (plain), or "auto"
    (flash on TPU, xla elsewhere). Numerics match plain softmax attention to
    f32 accumulation tolerance for any S.
    """
    seq_len = q.shape[-2]
    if impl == "auto":
        # Measured on v5e (b1-2, 24 heads, d64): XLA's fused attention wins
        # up to ~1.3k tokens (0.85 vs 2.7 ms at S=1301); the Pallas flash
        # kernel wins decisively once the [B,H,S,S] intermediate stops
        # fitting fusions (S=4224: 3.2 vs 32 ms; S=8448: 14 vs 29 ms) and is
        # the only option at whole-region scales where XLA would materialize
        # tens of GB of probs.
        impl = ("flash" if jax.default_backend() == "tpu" and seq_len > 2048
                else "xla")
    if impl == "xla":
        return _attn_reference(q, k, v, seq_len)
    interpret = impl == "flash_interpret" or jax.default_backend() != "tpu"
    s_pad = ((seq_len + 127) // 128) * 128
    qp, kp, vp = (_pad_to(t, s_pad) for t in (q, k, v))
    out = _flash_attention(qp, kp, vp, seq_len, interpret)
    return out[..., :seq_len, :]
