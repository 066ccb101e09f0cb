"""PSNR/SSIM checks against closed forms and torch-computed SSIM."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from mipheivit_tpu.metrics import PixelMetrics, psnr, ssim
from mipheivit_tpu.metrics.pixel import _gaussian_kernel


def test_psnr_closed_form(rng):
    t = rng.uniform(-0.9, 0.9, (2, 16, 16, 3)).astype(np.float32)
    p = np.clip(t + 0.1, -0.9, 0.9).astype(np.float32)
    got = float(psnr(jnp.array(p), jnp.array(t)))
    mse = np.mean((p - t) ** 2)
    assert abs(got - 10 * np.log10(1.8 ** 2 / mse)) < 1e-4


def test_ssim_identical_is_one(rng):
    t = rng.uniform(-0.9, 0.9, (1, 32, 32, 4)).astype(np.float32)
    assert float(ssim(jnp.array(t), jnp.array(t))) == pytest.approx(1.0, abs=1e-5)


def _torch_ssim(p, t, data_range=1.8):
    """Valid-window gaussian SSIM in torch for cross-checking."""
    g = torch.tensor(_gaussian_kernel(11, 1.5))
    kern = (g[:, None] @ g[None, :]).reshape(1, 1, 11, 11)
    c = p.shape[1]
    kern = kern.expand(c, 1, 11, 11)

    def blur(x):
        return F.conv2d(x, kern, groups=c)

    mu_p, mu_t = blur(p), blur(t)
    var_p = blur(p * p) - mu_p ** 2
    var_t = blur(t * t) - mu_t ** 2
    cov = blur(p * t) - mu_p * mu_t
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    s = ((2 * mu_p * mu_t + c1) * (2 * cov + c2)) / (
        (mu_p ** 2 + mu_t ** 2 + c1) * (var_p + var_t + c2))
    return float(s.mean())


def test_ssim_matches_torch_reference(rng):
    t = rng.uniform(-0.9, 0.9, (2, 24, 24, 3)).astype(np.float32)
    p = np.clip(t + rng.standard_normal(t.shape).astype(np.float32) * 0.2,
                -0.9, 0.9)
    ours = float(ssim(jnp.array(p), jnp.array(t)))
    ref = _torch_ssim(torch.tensor(p.transpose(0, 3, 1, 2)),
                      torch.tensor(t.transpose(0, 3, 1, 2)))
    assert abs(ours - ref) < 1e-4


def test_streaming_accumulator(rng):
    t = rng.uniform(-0.9, 0.9, (4, 16, 16, 3)).astype(np.float32)
    p = np.clip(t + 0.05, -0.9, 0.9).astype(np.float32)
    m = PixelMetrics.zeros()
    for i in range(2):
        m = m.update(jnp.array(p[i * 2:(i + 1) * 2]), jnp.array(t[i * 2:(i + 1) * 2]))
    out = m.compute()
    full_psnr = float(psnr(jnp.array(p), jnp.array(t)))
    assert abs(float(out["psnr"]) - full_psnr) < 1e-4


def test_epoch_ssim_pools_per_image_not_per_batch():
    """torchmetrics elementwise_mean weights each image equally across the
    epoch, so splitting the same images into ragged batches must not change
    the pooled value (reference: src/models.py:35-41)."""
    import jax.numpy as jnp
    from mipheivit_tpu.metrics import PixelMetrics

    rng = np.random.default_rng(7)
    pred = rng.standard_normal((5, 16, 16, 2)).astype(np.float32) * 0.3
    tgt = rng.standard_normal((5, 16, 16, 2)).astype(np.float32) * 0.3

    whole = PixelMetrics.zeros().update(jnp.array(pred), jnp.array(tgt))
    ragged = PixelMetrics.zeros()
    ragged = ragged.update(jnp.array(pred[:4]), jnp.array(tgt[:4]))
    ragged = ragged.update(jnp.array(pred[4:]), jnp.array(tgt[4:]))
    np.testing.assert_allclose(float(whole.compute()["ssim"]),
                               float(ragged.compute()["ssim"]), rtol=1e-6)
