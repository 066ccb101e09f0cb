"""Loss parity vs torch formulas (reference: src/loss.py)."""

import numpy as np
import torch
import torch.nn.functional as F

import pytest


import jax.numpy as jnp

from mipheivit_tpu.train import (
    adversarial_loss,
    focal_bce_loss,
    focal_l1_cubed_loss,
    weighted_mse_loss,
    weighted_mae_loss,
    l1_l2_loss,
)
from mipheivit_tpu.train.losses import marker_weights_from_stds

pytestmark = pytest.mark.tier0


def _pair(rng, shape=(2, 8, 8, 5)):
    a = rng.standard_normal(shape).astype(np.float32)
    b = rng.standard_normal(shape).astype(np.float32)
    return a, b


def test_focal_l1_cubed_matches_reference_formula(rng):
    y, p = _pair(rng)
    fw = np.array([1.0, 2.0, 4.0, 1.0, 8.0], np.float32)
    ours = float(focal_l1_cubed_loss(50.0, fw)(jnp.array(y), jnp.array(p)))
    # reference: (|err|**3 * w/w.sum()).sum(ch).mean() * lambda  (NCHW ch=1)
    w = torch.tensor(fw / fw.sum()).reshape(1, -1, 1, 1)
    t = (F.l1_loss(torch.tensor(p.transpose(0, 3, 1, 2)),
                   torch.tensor(y.transpose(0, 3, 1, 2)),
                   reduction="none") ** 3 * w).sum(dim=1).mean() * 50.0
    assert abs(ours - float(t)) < 1e-4


def test_weighted_mse_matches_reference_formula(rng):
    y, p = _pair(rng)
    mw = marker_weights_from_stds([10.0, 5.0, 2.0, 40.0, 8.0])
    assert mw.min() == 1.0
    ours = float(weighted_mse_loss(50.0, mw)(jnp.array(y), jnp.array(p)))
    loss = F.mse_loss(torch.tensor(p.transpose(0, 3, 1, 2)),
                      torch.tensor(y.transpose(0, 3, 1, 2)), reduction="none")
    t = (loss.mean(dim=(0, 2, 3)) * torch.tensor(mw)).mean() * 50.0
    assert abs(ours - float(t)) < 1e-4


def test_focal_bce_matches_torch(rng):
    logits = rng.standard_normal((4, 7)).astype(np.float32)
    targets = (rng.random((4, 7)) > 0.5).astype(np.float32)
    ours = float(focal_bce_loss(0.75, 2.0)(jnp.array(logits), jnp.array(targets)))
    bce = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(targets), reduction="none")
    pt = torch.exp(-bce)
    t = (0.75 * (1 - pt) ** 2 * bce).mean()
    assert abs(ours - float(t)) < 1e-5


def test_adversarial_loss_matches_torch(rng):
    logits = rng.standard_normal((3, 5)).astype(np.float32)
    ours = float(adversarial_loss(jnp.array(logits), jnp.zeros((3, 5))))
    t = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.zeros(3, 5))
    assert abs(ours - float(t)) < 1e-5
    ours_ls = float(adversarial_loss(jnp.array(logits), jnp.ones((3, 5)), lsgan=True))
    t_ls = F.mse_loss(torch.tensor(logits), torch.ones(3, 5))
    assert abs(ours_ls - float(t_ls)) < 1e-5


def test_weighted_mae_and_l1l2(rng):
    y, p = _pair(rng)
    fw = np.array([2.0, 1.0, 3.0, 1.0, 1.0], np.float32)
    val = float(weighted_mae_loss(50.0, fw, np.full(5, -0.9, np.float32))(
        jnp.array(y), jnp.array(p)))
    assert np.isfinite(val) and val > 0
    v2 = float(l1_l2_loss(10.0)(jnp.array(y), jnp.array(p)))
    l1 = F.l1_loss(torch.tensor(p), torch.tensor(y))
    l2 = F.mse_loss(torch.tensor(p), torch.tensor(y))
    assert abs(v2 - float(10 * (l1 + l2) / 2)) < 1e-4
