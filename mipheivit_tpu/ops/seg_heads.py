"""Pallas-fused per-marker segmentation heads (inference fast path).

``BatchedSegHeads`` (models/mipheivit.py) already collapses the K
attention-gated head chains (reference: src/generators/unet.py:407-438)
into one matmul + 9-tap stencil, but in XLA every stage still round-trips
HBM: the psi-gate activations [B,H,W,K*C/2], the tap matrix
[B,H+2,W+2,9K], and the nine shifted stencil reads amortize to ~13 ms of
pure bandwidth per B=64 batch at 256 px. This kernel runs the whole chain
-- gate matmuls, BN-folded bias, sigmoid, tap matmul, 9-tap gated stencil,
activation -- on one VMEM-resident row band per program, so HBM sees only
the input read (twice, for the halo) and the output write.

Halo handling: each program receives TWO consecutive 8-row blocks of the
padded input through shifted BlockSpec index maps (rows [8i, 8i+16) cover
the band's [8i, 8i+10) stencil support). That keeps every DMA a normal
blocked transfer -- Mosaic rejects sub-lane-width (C < 128) slices of
HBM-resident refs, so a manual halo DMA is not expressible here.

Numerics: matmuls in the input dtype with f32 accumulation, elementwise in
f32 -- same contract as the XLA path (BN is folded into the first matmul's
weights/bias in f32 outside the kernel). Zero-padding semantics are free:
``m = x_pad @ wm`` vanishes at padded positions, so out-of-image taps
contribute exactly zero, matching the reference's zero-padded conv3x3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TH = 8          # output rows per program (one sublane tile)


def _kernel(xa_ref, xb_ref, w1_ref, b1_ref, w2_ref, b2_ref, wm_ref, bf_ref,
            o_ref, *, wp: int, activation: str):
    c = xa_ref.shape[-1]
    k = b2_ref.shape[-1]
    w = o_ref.shape[2]
    xband = jnp.concatenate([xa_ref[0], xb_ref[0]], axis=0)  # [16, wp, C]
    rows = 2 * _TH * wp
    x2 = xband.reshape(rows, c)               # clean merge: wp % 8 == 0

    g1 = jax.lax.dot_general(
        x2, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[0]
    g1 = jnp.maximum(g1, 0.0).astype(x2.dtype)
    gate = jax.nn.sigmoid(jax.lax.dot_general(
        g1, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[0])
    m = jax.lax.dot_general(
        x2, wm_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)     # [rows, 9K] f32

    m3 = m.reshape(2 * _TH, wp, 9 * k)
    g3 = gate.reshape(2 * _TH, wp, k)
    acc = jnp.zeros((_TH, w, k), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            t = dy * 3 + dx
            acc = acc + (m3[dy:dy + _TH, dx:dx + w, t * k:(t + 1) * k]
                         * g3[dy:dy + _TH, dx:dx + w])
    out = acc + bf_ref[0]
    if activation == "tanh":
        out = jnp.tanh(out)
    elif activation == "sigmoid":
        out = jax.nn.sigmoid(out)
    o_ref[0] = out.astype(o_ref.dtype)


def supported(h: int, w: int) -> bool:
    return h % _TH == 0 and w % 8 == 0


def fused_seg_heads(x, w1eff, b1eff, w2bd, b2, wm, bf, *,
                    activation: str = "tanh", interpret: bool = False):
    """Run the fused head chain on NHWC ``x``.

    Args:
      x: [B, H, W, C] feature map (H % 8 == 0, W % 8 == 0).
      w1eff: [C, K*C2] psi-conv1 kernel with BN scale/rsqrt folded in (f32).
      b1eff: [K*C2] folded BN bias.
      w2bd: [K*C2, K] block-diagonal psi-conv2 (head k only sees its C2
        slice; built by the caller so the kernel runs one dense matmul).
      b2: [K] psi-conv2 bias.
      wm: [C, 9K] tap matrix (tap-major columns).
      bf: [K] final conv bias.
    Returns [B, H, W, K] in x.dtype.
    """
    b, h, w, c = x.shape
    k = b2.shape[-1]
    wp = w + 8                       # 1 left halo + 7 spare: multiple of 8
    # rows: 1 top halo + 7 spare so (h + 8) covers block index i+1 = h/8
    xp = jnp.pad(x, ((0, 0), (1, 7), (1, 7), (0, 0)))
    dt = x.dtype

    def cast(a):
        return a.astype(dt)

    x_spec = pl.BlockSpec((1, _TH, wp, c), lambda i, j: (i, j, 0, 0))
    x_next = pl.BlockSpec((1, _TH, wp, c), lambda i, j: (i, j + 1, 0, 0))
    kernel = functools.partial(_kernel, wp=wp, activation=activation)
    out = pl.pallas_call(
        kernel,
        grid=(b, h // _TH),
        in_specs=[
            x_spec,
            x_next,
            pl.BlockSpec((c, w1eff.shape[-1]), lambda i, j: (0, 0)),
            pl.BlockSpec((1, b1eff.shape[-1]), lambda i, j: (0, 0)),
            pl.BlockSpec(w2bd.shape, lambda i, j: (0, 0)),
            pl.BlockSpec((1, k), lambda i, j: (0, 0)),
            pl.BlockSpec((c, 9 * k), lambda i, j: (0, 0)),
            pl.BlockSpec((1, k), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _TH, w, k), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, k), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, xp, cast(w1eff), cast(b1eff)[None], cast(w2bd), cast(b2)[None],
      cast(wm), cast(bf)[None])
    return out
