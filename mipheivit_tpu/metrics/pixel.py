"""Pixel-level metrics: PSNR / SSIM on the (-0.9, 0.9) mIF range.

The reference logs torchmetrics ``PeakSignalNoiseRatio`` and
``StructuralSimilarityIndexMeasure`` with ``data_range=(-0.9, 0.9)``
(reference: src/models.py:35-41) and clips predictions before update
(src/models.py:140-143). Semantics reproduced:

  * inputs are clamped to the range; range scalar = high - low,
  * PSNR pools the MSE over the entire epoch (dim=None, reduction via
    sum-of-squared-error and element counts),
  * SSIM uses a gaussian 11x11 / sigma 1.5 window per channel, computed on
    valid (unpadded) windows, averaged per image then over the epoch.

``PixelMetrics`` is a pure accumulator pytree usable inside jitted eval
steps (carry it through lax.scan / pjit; psum-able across data shards).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def psnr(pred, target, data_range: Tuple[float, float] = (-0.9, 0.9)):
    lo, hi = data_range
    pred = jnp.clip(pred, lo, hi)
    target = jnp.clip(target, lo, hi)
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10((hi - lo) ** 2 / mse)


def ssim_per_image(pred, target,
                   data_range: Tuple[float, float] = (-0.9, 0.9),
                   kernel_size: int = 11, sigma: float = 1.5,
                   k1: float = 0.01, k2: float = 0.03):
    """Per-image SSIM over a batch of NHWC images -> [B]."""
    lo, hi = data_range
    rng = hi - lo
    pred = jnp.clip(pred, lo, hi).astype(jnp.float32)
    target = jnp.clip(target, lo, hi).astype(jnp.float32)

    g = jnp.asarray(_gaussian_kernel(kernel_size, sigma))

    def blur(x):
        # separable valid-window gaussian filter over H and W (per channel)
        x = jax.vmap(lambda img: jnp.apply_along_axis(
            lambda v: jnp.convolve(v, g, mode="valid"), 0, img))(x)
        x = jax.vmap(lambda img: jnp.apply_along_axis(
            lambda v: jnp.convolve(v, g, mode="valid"), 1, img))(x)
        return x

    mu_p = blur(pred)
    mu_t = blur(target)
    mu_pp = blur(pred * pred)
    mu_tt = blur(target * target)
    mu_pt = blur(pred * target)

    var_p = mu_pp - mu_p ** 2
    var_t = mu_tt - mu_t ** 2
    cov = mu_pt - mu_p * mu_t

    c1 = (k1 * rng) ** 2
    c2 = (k2 * rng) ** 2
    num = (2 * mu_p * mu_t + c1) * (2 * cov + c2)
    den = (mu_p ** 2 + mu_t ** 2 + c1) * (var_p + var_t + c2)
    return jnp.mean(num / den, axis=tuple(range(1, num.ndim)))


def ssim(pred, target, data_range: Tuple[float, float] = (-0.9, 0.9),
         **kw):
    """Batch-mean SSIM."""
    return jnp.mean(ssim_per_image(pred, target, data_range, **kw))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PixelMetrics:
    """Streaming accumulator: update per batch inside jit, finalize on host."""

    sse: jnp.ndarray        # sum of squared error (clamped)
    count: jnp.ndarray      # element count
    ssim_sum: jnp.ndarray   # sum of per-image SSIM
    images: jnp.ndarray     # valid-image count (torchmetrics pools per image)

    @classmethod
    def zeros(cls) -> "PixelMetrics":
        z = jnp.zeros((), jnp.float32)
        return cls(sse=z, count=z, ssim_sum=z, images=z)

    def update(self, pred, target,
               data_range: Tuple[float, float] = (-0.9, 0.9),
               mask=None) -> "PixelMetrics":
        """mask: optional [B] validity weights (padded eval batches)."""
        lo, hi = data_range
        p = jnp.clip(pred, lo, hi)
        t = jnp.clip(target, lo, hi)
        per_image_elems = float(np.prod(pred.shape[1:]))
        ssim_vals = ssim_per_image(pred, target, data_range)
        if mask is None:
            mask = jnp.ones(pred.shape[0], jnp.float32)
        mask = mask.astype(jnp.float32)
        mshape = (pred.shape[0],) + (1,) * (pred.ndim - 1)
        return PixelMetrics(
            sse=self.sse + jnp.sum((p - t) ** 2 * mask.reshape(mshape)),
            count=self.count + jnp.sum(mask) * per_image_elems,
            # torchmetrics StructuralSimilarityIndexMeasure pools the epoch
            # per image (sum of per-image SSIM / n images), not per batch —
            # matters when the last batch is ragged (reference:
            # src/models.py:35-41 via torchmetrics elementwise_mean).
            ssim_sum=self.ssim_sum + jnp.sum(ssim_vals * mask),
            images=self.images + jnp.sum(mask),
        )

    def compute(self, data_range: Tuple[float, float] = (-0.9, 0.9)):
        lo, hi = data_range
        mse = self.sse / jnp.maximum(self.count, 1.0)
        return {
            "psnr": 10.0 * jnp.log10((hi - lo) ** 2 / mse),
            "ssim": self.ssim_sum / jnp.maximum(self.images, 1.0),
        }
