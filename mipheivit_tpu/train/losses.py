"""Reconstruction / adversarial / cell losses (reference: src/loss.py).

All pure jnp functions over NHWC tensors; channel weights broadcast over the
last axis. The reference's channel dim is 1 (NCHW); semantics preserved.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def focal_l1_cubed_loss(lambda_factor: float, foreground_weight) -> Callable:
    """Per-channel-weighted |err|^3 ("focal" reconstruction loss used when
    ``use_weighted_mae`` — reference: src/loss.py:60-66, wired at
    src/train.py:133). weights are normalized to sum to 1."""
    w = jnp.asarray(foreground_weight, jnp.float32).reshape(-1)
    w = w / w.sum()

    def loss(y_true, y_pred):
        l1 = jnp.abs(y_true - y_pred) ** 3
        return jnp.mean(jnp.sum(l1 * w, axis=-1)) * lambda_factor

    return loss


def weighted_mse_loss(lambda_factor: float, marker_weights) -> Callable:
    """Channel-weighted MSE; weights = (1/std)/min(1/std)
    (reference: src/loss.py:47-57, src/train.py:137-142)."""
    w = jnp.asarray(marker_weights, jnp.float32).reshape(-1)

    def loss(y_true, y_pred):
        per_ch = jnp.mean((y_true - y_pred) ** 2, axis=(0, 1, 2))
        return jnp.mean(per_ch * w) * lambda_factor

    return loss


def marker_weights_from_stds(stds) -> np.ndarray:
    w = 1.0 / np.asarray(stds, np.float32)
    return w / w.min()


def mae_loss(lambda_factor: float) -> Callable:
    return lambda y_true, y_pred: jnp.mean(jnp.abs(y_true - y_pred)) * lambda_factor


def mse_loss(lambda_factor: float) -> Callable:
    return lambda y_true, y_pred: jnp.mean((y_true - y_pred) ** 2) * lambda_factor


def weighted_mae_loss(sim_loss_factor: float, foreground_weight,
                      foreground_thresh) -> Callable:
    """Foreground-weighted L1 (reference: src/loss.py:21-32)."""
    w = jnp.asarray(foreground_weight, jnp.float32).reshape(-1)
    thresh = jnp.asarray(foreground_thresh, jnp.float32).reshape(-1)

    def loss(y_true, y_pred):
        weights = jnp.where(y_true > thresh, w, 1.0)
        return 2.0 * sim_loss_factor * jnp.mean(jnp.abs(y_pred - y_true) * weights)

    return loss


def shrinkage_loss(lambda_factor: float, foreground_weight) -> Callable:
    """Shrinkage loss (reference: src/loss.py:69-77)."""
    w = jnp.asarray(foreground_weight, jnp.float32).reshape(-1)
    wn = w / w.sum()

    def loss(y_true, y_pred):
        l = jnp.abs(y_true - y_pred)
        val = l ** 2 / (1.0 + jnp.exp(10.0 * (0.2 - l)))
        return jnp.mean(jnp.sum(val * wn, axis=-1)) * lambda_factor

    return loss


def l1_l2_loss(lambda_factor: float) -> Callable:
    """(L1 + L2)/2 * lambda (reference: src/loss.py:113-123)."""

    def loss(y_true, y_pred):
        l1 = jnp.mean(jnp.abs(y_pred - y_true))
        l2 = jnp.mean((y_pred - y_true) ** 2)
        return lambda_factor * (l1 + l2) / 2.0

    return loss


def total_variation_loss(image) -> jnp.ndarray:
    """TV regularizer over NHWC (reference: src/loss.py:104-110)."""
    tv_w = jnp.mean(jnp.abs(image[:, :, :-1] - image[:, :, 1:]))
    tv_h = jnp.mean(jnp.abs(image[:, :-1] - image[:, 1:]))
    return tv_w + tv_h


def focal_bce_loss(alpha: float = 0.25, gamma: float = 2.0) -> Callable:
    """Binary focal loss on logits (reference: src/loss.py:8-18; the
    foreground head uses alpha=0.75 gamma=2, src/models.py:28)."""

    def loss(logits, targets):
        bce = optax_sigmoid_bce(logits, targets)
        pt = jnp.exp(-bce)
        return jnp.mean(alpha * (1.0 - pt) ** gamma * bce)

    return loss


def optax_sigmoid_bce(logits, labels):
    """Numerically-stable BCE-with-logits (torch parity)."""
    zeros = jnp.zeros_like(logits)
    return jnp.maximum(logits, zeros) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def adversarial_loss(logits, targets, lsgan: bool = False) -> jnp.ndarray:
    """BCE-with-logits (default) or LSGAN MSE
    (reference: src/models.py:81-85)."""
    if lsgan:
        return jnp.mean((logits - targets) ** 2)
    return jnp.mean(optax_sigmoid_bce(logits, targets))


def get_foreground_weight(channel_names, train_dataframe) -> np.ndarray:
    """Channel weight = max(p_bg/p_fg, 1) from ``{m}_prop`` tile-dataframe
    columns (reference: src/utils.py:202-206)."""
    cols = [f"{name}_prop" for name in channel_names]
    p_fg = train_dataframe[cols].mean(axis=0).to_numpy(dtype=np.float64)
    fw = 1.0 - p_fg
    # reference formula: max(fw / (1 - fw), 1) = max(p_bg / p_fg, 1)
    return np.maximum(fw / (1.0 - fw), 1.0)


def build_reconstruction_loss(cfg, channel_names, channel_stats,
                              train_dataframe=None) -> Callable:
    """Reference wiring (src/train.py:117-143): ``use_weighted_mae`` ->
    focal-L1^3 with foreground weights from the tile dataframe; otherwise
    weighted MSE with 1/std marker weights."""
    lam = cfg.train.losses.lambda_factor
    if cfg.train.losses.use_weighted_mae:
        if train_dataframe is None:
            raise ValueError("use_weighted_mae requires the train dataframe")
        fw = get_foreground_weight(channel_names, train_dataframe)
        return focal_l1_cubed_loss(lam, np.float32(fw))
    stds = channel_stats.stds(channel_names)
    return weighted_mse_loss(lam, marker_weights_from_stds(stds))
