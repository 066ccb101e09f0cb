"""Device mesh + named shardings.

The reference is strictly single-GPU (Trainer devices=1, src/train.py:206);
multi-chip scaling here is new capability, done the JAX way: a named
``Mesh`` over ICI, batch-sharded data, replicated (or model-sharded)
params, and XLA-inserted collectives — no hand-written NCCL analogs
(SURVEY.md §2.2, §5).

Default layout: 1-D ``data`` axis; gradients all-reduce over ICI because
params are replicated and the batch is sharded. An optional ``model`` axis
tensor-shards the ViT MLP/attention heads for activation-memory headroom at
large batch (SURVEY.md §2.2 consequence (b)).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def make_data_mesh(batch_size: int, devices: Optional[Sequence] = None):
    """Data-parallel mesh over the largest device count that divides the
    batch; returns None when only one device would be used."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    if n <= 1:
        return None
    return make_mesh(n_data=n, devices=devices[:n])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree onto the mesh, sharded on axis 0."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
