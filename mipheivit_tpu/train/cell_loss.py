"""Cell-level losses (reference: src/loss.py:153-227).

``CellLoss`` = per-nucleus-mean MSE * lambda + optional ``CellClusterLoss``:
a frozen 3-layer MLP gating classifier run on unnormalized per-cell means,
with a focal loss pulling predicted-cell soft labels toward the target-cell
pseudo-labels. The frozen MLP ships as a torch checkpoint (``mlp.ckpt``);
weights are imported to jax once at construction.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.segment_pool import segment_mean_pool
from .losses import focal_bce_loss


def _mlp_apply(params, x):
    """NormalizationLayer -> Linear/ReLU x2 -> Linear -> sigmoid
    (reference: src/loss.py:185-193)."""
    x = (x - params["norm_mean"]) / params["norm_std"]
    x = jax.nn.relu(x @ params["w1"] + params["b1"])
    x = jax.nn.relu(x @ params["w2"] + params["b2"])
    return jax.nn.sigmoid(x @ params["w3"] + params["b3"])


def load_cluster_mlp(mlp_path: str, n_channels: int):
    """Torch 'mlp.ckpt' -> jax param dict (keys per reference
    state-dict layout: model.{0,1,3,5}.*)."""
    import torch

    obj = torch.load(mlp_path, map_location="cpu", weights_only=True)
    state = obj.get("state_dict", obj)
    state = {k.replace("model.", ""): v.numpy() for k, v in state.items()}

    def t(k):
        return np.ascontiguousarray(state[k].T)

    return {
        "norm_mean": state.get("0.mean", np.zeros(n_channels, np.float32)),
        "norm_std": state.get("0.std", np.ones(n_channels, np.float32)),
        "w1": t("1.weight"), "b1": state["1.bias"],
        "w2": t("3.weight"), "b2": state["3.bias"],
        "w3": t("5.weight"), "b3": state["5.bias"],
    }


def build_cell_loss(mlp_path: Optional[str], n_channels: int,
                    use_mse: bool = True, use_clustering: bool = True,
                    lambda_factor: float = 50.0,
                    capacity: int = 1024) -> Callable:
    """Returns ``loss(pred_nhwc, target_nhwc, nuclei_bhw) -> scalar``."""
    mlp_params = None
    if use_clustering:
        if mlp_path is None:
            raise ValueError("clustering cell loss requires mlp_path")
        mlp_params = jax.tree.map(jnp.asarray, load_cluster_mlp(mlp_path, n_channels))
    focal = focal_bce_loss(alpha=0.5, gamma=2.0)
    eps = 1e-6

    def loss(pred, target, nuclei):
        if not (use_mse or use_clustering):
            return jnp.zeros((), jnp.float32)
        _, pred_means, valid = segment_mean_pool(pred, nuclei, capacity)
        _, targ_means, _ = segment_mean_pool(target, nuclei, capacity)
        w = valid.astype(jnp.float32)
        denom = jnp.maximum(w.sum(), 1.0)
        total = jnp.zeros((), jnp.float32)
        if use_mse:
            mse = jnp.sum(((pred_means - targ_means) ** 2).mean(-1) * w) / denom
            total = total + mse * lambda_factor
        if use_clustering:
            pred_un = (pred_means + 0.9) / 1.8 * 255.0
            targ_un = (targ_means + 0.9) / 1.8 * 255.0
            p_in = jnp.clip(_mlp_apply(mlp_params, pred_un), eps, 1 - eps)
            p_tg = jax.lax.stop_gradient(
                jnp.clip(_mlp_apply(mlp_params, targ_un), eps, 1 - eps))
            labels = (p_tg > 0.5).astype(p_tg.dtype)
            # focal on probabilities (reference feeds probs as "logits",
            # src/loss.py:210 — preserved verbatim)
            bce = -(labels * jnp.log(jax.nn.sigmoid(p_in))
                    + (1 - labels) * jnp.log(1 - jax.nn.sigmoid(p_in)))
            pt = jnp.exp(-bce)
            fl = 0.5 * (1 - pt) ** 2 * bce
            mask = w[..., None]
            total = total + jnp.sum(fl * mask) / jnp.maximum(mask.sum() * fl.shape[-1], 1.0)
        return total

    return loss
