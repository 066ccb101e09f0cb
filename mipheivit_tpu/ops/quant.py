"""Post-training int8 (W8A8, dynamic activation) matmul for serving.

The v5e MXU runs int8 x int8 -> int32 at twice the bf16 rate (394 TOPS vs
197 TFLOP/s), and the ViT-g encoder's Dense matmuls are ~77% of the
flagship forward — so a W8A8 serving mode *can* roughly halve the
dominant term. This is an *opt-in* transform
(``infer.loading.quantize_encoder`` / ``bench.py --int8``): the bf16 path
stays the default because (a) the parity budget vs the torch reference
(BASELINE.md, 0.5% Pearson) is reserved for import/compute exactness, not
quantization error, and (b) the throughput win is unproven — on the
tunneled dev chip, executables containing int8 dots show random
multi-second per-execution stalls that bf16 never does, making the mode
unmeasurable there and on-average slower (BASELINE.md "int8 W8A8
serving: measured negative"). Re-measure on a host-local TPU VM before
enabling in production.

Scheme (standard symmetric PTQ):
  * weights:     per-output-channel int8, scale = max|w[:, j]| / 127,
                 folded offline by ``quantize_weight``;
  * activations: per-row (per-token) dynamic int8, scale computed on the
                 fly — one VPU max-reduce per row, which XLA fuses into
                 the producing elementwise chain;
  * accumulate int32 on the MXU, dequantize with the rank-1 outer product
    of the two scales, add bias in f32.

No torch-reference counterpart (serving-only, new capability).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def quantize_weight(w, axis: int = -2):
    """Symmetric per-output-channel int8: w ~= w_i8 * scale.

    ``w``: [..., in, out] (flax Dense kernel; a leading depth axis from
    ``nn.scan``-stacked blocks passes through). Reduction is over ``axis``
    (the contraction dim). Returns (w_i8 same shape int8, scale
    [..., out] f32).
    """
    w = np.asarray(w, np.float32)
    amax = np.max(np.abs(w), axis=axis, keepdims=True)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    w_i8 = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return w_i8, np.squeeze(scale, axis=axis)


def int8_matmul(x, w_i8, w_scale, bias=None):
    """``x @ dequant(w_i8)`` with dynamic per-row activation quantization.

    x: [..., K] float; w_i8: [K, N] int8; w_scale: [N] f32.
    Returns [..., N] in x.dtype. The int8 dot rides the MXU at 2x bf16
    rate; quant/dequant are VPU elementwise passes XLA fuses away.
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    xf = x2.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.where(amax > 0, amax / 127.0, 1.0)
    x_i8 = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_i8, w_i8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (sx * w_scale[None, :])
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :]
    return out.astype(x.dtype).reshape(*lead, -1)


def int8_conv3x3(x, w_i8, w_scale):
    """3x3/stride-1 W8A8 conv as int8 im2col matmul, HBM-bounded.

    Numerically identical to ``int8_matmul(_im2col_patches(x), ...)`` —
    the per-patch-row activation scale max|row| equals the 3x3 window max
    of the per-pixel channel amax — but computed WITHOUT an f32 copy of
    the [B*H*W, 9C] patches: the scale comes from a [B, H, W] channel-amax
    + 3x3 max-pool (tiny), so each f32 tap is a single-use producer XLA
    fuses into its int8 consumer and only the int8 patches (1 byte/elem)
    ever land in HBM. At the flagship's fusion3 (B=96, 128^2, 9C=1008) the
    old path's f32 patches alone were ~6.3 GB and OOM'd the 16 GB v5e
    (logs/chip_r4/bench_int8.log); this one materializes ~1.6 GB.

    x: [B, H, W, C] float; w_i8: [9C, K] int8 (``flatten_conv3x3_kernel``
    order); w_scale: [K] f32. Returns [B, H, W, K] in x.dtype.
    """
    b, h, w, c = x.shape
    # per-output-pixel scale: 3x3 max-pool of the per-pixel channel amax
    m = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)      # [B, H, W]
    mp = jnp.pad(m, ((0, 0), (1, 1), (1, 1)))
    win = jnp.stack([mp[:, dy:dy + h, dx:dx + w]
                     for dy in range(3) for dx in range(3)]).max(axis=0)
    sx = jnp.where(win > 0, win / 127.0, 1.0)                 # [B, H, W]
    inv = (1.0 / sx)[..., None]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [jnp.clip(jnp.round(
                xp[:, dy:dy + h, dx:dx + w, :].astype(jnp.float32) * inv),
                -127, 127).astype(jnp.int8)
            for dy in range(3) for dx in range(3)]
    pat = jnp.concatenate(taps, axis=-1).reshape(b * h * w, 9 * c)
    acc = jax.lax.dot_general(
        pat, w_i8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = (acc.astype(jnp.float32)
           * (sx.reshape(-1, 1) * w_scale[None, :]))
    return out.reshape(b, h, w, -1).astype(x.dtype)
