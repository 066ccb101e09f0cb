"""LR schedules and layer-wise decay (reference: src/utils.py:217-306).

Expressed as optax-compatible scalar schedules / multiplier maps.
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def pix2pix_schedule(base_lr: float, total_iters: int,
                     warmup_iters: int = 400,
                     decay_start_iter: int | None = None) -> Callable:
    """Linear warmup -> constant -> linear decay to 0 from total/2
    (reference: src/utils.py:217-230, wired at src/models.py:363-371)."""
    if decay_start_iter is None:
        decay_start_iter = total_iters // 2

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = step / max(warmup_iters, 1)
        decay_steps = max(total_iters - decay_start_iter, 1)
        decay = jnp.maximum(0.0, 1.0 - (step - decay_start_iter) / decay_steps)
        factor = jnp.where(
            step < warmup_iters, warm,
            jnp.where(step < decay_start_iter, 1.0, decay),
        )
        return base_lr * factor

    return schedule


def scaled_lr(base_lr: float, batch_size: int) -> float:
    """sqrt-batch LR scaling (reference: src/train.py:163-164)."""
    return base_lr * float(np.sqrt(batch_size))


def vit_layer_decay_rate(name: str, lr_decay_rate: float = 0.65,
                         num_layers: int = 12) -> float:
    """Layer-wise LR decay multiplier for fully-trainable ViT encoders
    (reference: src/utils.py:289-306). ``name`` is a '/'-joined flax param
    path; patch/pos embed get layer 0, block i gets layer i+1, the rest
    num_layers+1."""
    layer_id = num_layers + 1
    if "encoder" in name:
        if "pos_embed" in name or "patch_embed" in name:
            layer_id = 0
        elif "blocks_" in name:
            idx = name.split("blocks_")[1].split("/")[0]
            layer_id = int(idx) + 1
    return lr_decay_rate ** (num_layers + 1 - layer_id)
