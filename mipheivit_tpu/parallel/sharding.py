"""Tensor-parallel sharding rules for the ViT encoder.

SURVEY.md §2.2 consequence (b): the 1.1B-param encoder fits one chip in
bf16, but sharding the MLP/attention over a ``model`` mesh axis buys
activation-memory headroom at large batch. The GSPMD way: annotate the
param pytree with NamedShardings (Megatron-style column/row splits on the
scanned block weights) and let XLA insert the all-reduces — no module
changes, the same jitted step runs tensor-parallel.

Layout (leading axis L = scanned layer):
  attn.qkv.kernel  [L, D, 3D]  -> split output  (column)
  attn.proj.kernel [L, D, D]   -> split input   (row)
  mlp.fc1.kernel   [L, D, 2H]  -> split output  (column)
  mlp.fc2.kernel   [L, H, D]   -> split input   (row)
  biases of column-split layers follow their outputs; row-split outputs
  and everything else replicate.

Note: the packed-SwiGLU fc1 output is [value | gate] halves; splitting the
2H axis over the mesh keeps each half's shards aligned as long as
H % n_model == 0 (asserted by the caller via divisibility of the mesh).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_str(keypath) -> str:
    parts = []
    for k in keypath:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/".join(parts)


def encoder_param_specs(params: Any) -> Any:
    """PartitionSpec pytree for a generator param tree containing a scanned
    ViT (works for both MipheiViT ``encoder/vit`` and UNETR
    ``encoder_vit`` subtrees); non-encoder params replicate."""

    def decide(keypath, leaf):
        path = _path_str(keypath)
        scanned = "blocks/" in path
        off = 1 if scanned else 0
        if "attn/qkv/kernel" in path or "mlp/fc1/kernel" in path:
            return P(*([None] * (off + 1) + ["model"]))
        if "attn/qkv/bias" in path or "mlp/fc1/bias" in path:
            return P(*([None] * off + ["model"]))
        if "attn/proj/kernel" in path or "mlp/fc2/kernel" in path:
            return P(*([None] * off + ["model", None]))
        return P()

    return jax.tree_util.tree_map_with_path(decide, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a param pytree on the mesh per ``encoder_param_specs``."""
    specs = encoder_param_specs(params)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params, specs)


def shard_opt_state(opt, opt_state: Any, params: Any, mesh: Mesh) -> Any:
    """Place the optimizer moments on the mesh following the param layout.

    ``optax.tree_map_params`` knows which sub-trees of an arbitrary
    (chained / masked) optax state mirror the params, so the Adam mu/nu
    buffers get the same Megatron column/row splits as their weights and
    the update never all-gathers a replicated moment against a sharded
    param.
    """
    import optax

    specs = encoder_param_specs(params)
    return optax.tree_map_params(
        opt,
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        opt_state, specs)
