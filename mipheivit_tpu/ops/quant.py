"""Post-training int8 (W8A8, dynamic activation) matmul for serving.

The v5e MXU runs int8 x int8 -> int32 at twice the bf16 rate (394 TOPS vs
197 TFLOP/s), and the ViT-g encoder's Dense matmuls are ~77% of the
flagship forward — so a W8A8 serving mode roughly halves the dominant
term. This is an *opt-in* transform (``infer.loading.quantize_encoder`` /
``bench.py --int8``): the bf16 path stays the default because the parity
budget vs the torch reference (BASELINE.md, 0.5% Pearson) is reserved for
import/compute exactness, not quantization error.

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
