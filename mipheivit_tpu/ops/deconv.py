"""Bit-exact torch ``ConvTranspose2d`` for checkpoint-parity paths.

flax's ``nn.ConvTranspose`` with ``padding='SAME'`` distributes padding
symmetrically, but torch's transposed conv pads the stride-dilated input
with ``(k-1-p, k-1-p+output_padding)`` per spatial dim — asymmetric whenever
``output_padding > 0`` (the HEMIT generators' k3/s2/p1/op1 upsamples,
reference: src/generators/hemit_models.py) and a one-pixel edge difference
results. This module runs the equivalent direct conv via
``lax.conv_general_dilated`` on the dilated input with torch's exact pads.

Param layout and names match ``nn.ConvTranspose`` (kernel ``[kh, kw, in,
out]``, spatially flipped torch weights — see ``import_weights._convT``), so
checkpoints move between the two without key surgery.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class TorchConvTranspose(nn.Module):
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (2, 2)
    padding: int = 1
    output_padding: int = 0
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features))
        p, op = self.padding, self.output_padding
        pads = ((kh - 1 - p, kh - 1 - p + op),
                (kw - 1 - p, kw - 1 - p + op))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1, 1), padding=pads,
            lhs_dilation=tuple(self.strides),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(self.dtype)
        return y
