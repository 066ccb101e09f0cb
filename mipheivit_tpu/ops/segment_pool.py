"""Per-nucleus pooling as fixed-capacity segment reductions.

The reference pools predicted marker intensities per nucleus with
``torch.unique(return_inverse=True)`` + ``scatter_add_`` per batch element
(reference: src/utils.py:49-121 ``MeanCellExtrator``, src/metrics.py:32-74
``CellMetrics.update``). That shape-dynamic pattern doesn't compile under
XLA; here it becomes a fixed-capacity ``jnp.unique(size=K)`` +
``segment_sum`` that jits, vmaps over the batch, and stays entirely on
device. Pad slots come back with count 0; background is the label-0 slot.
Callers filter both on the host (mirroring the reference's area>min filter
done in pandas, src/metrics.py:148).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("capacity",))
def nucleus_pool(
    values: jnp.ndarray,   # [B, H, W, C] float
    labels: jnp.ndarray,   # [B, H, W] integer nucleus ids (0 = background)
    capacity: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-(sample, nucleus) channel sums and pixel counts.

    Returns (ids [B,K], sums [B,K,C], counts [B,K]); slots with count==0 are
    padding, the slot whose id==0 (if present) is background. K = capacity
    must bound the number of distinct labels (incl. 0) per tile.
    """

    def one(vals, labs):
        flat_labs = labs.reshape(-1)
        flat_vals = vals.reshape(-1, vals.shape[-1])
        ids, inv = jnp.unique(
            flat_labs, size=capacity, fill_value=0, return_inverse=True
        )
        sums = jax.ops.segment_sum(flat_vals, inv, num_segments=capacity)
        counts = jax.ops.segment_sum(
            jnp.ones_like(flat_labs, jnp.float32), inv, num_segments=capacity
        )
        return ids, sums, counts

    return jax.vmap(one)(values, labels)


def segment_mean_pool(values, labels, capacity: int = 1024):
    """Per-nucleus means (matching ``MeanCellExtrator``): returns
    (ids [B,K], means [B,K,C], valid [B,K]) where valid excludes background
    and padding."""
    ids, sums, counts = nucleus_pool(values, labels, capacity)
    means = sums / jnp.maximum(counts[..., None], 1.0)
    valid = (counts > 0) & (ids > 0)
    return ids, means, valid
