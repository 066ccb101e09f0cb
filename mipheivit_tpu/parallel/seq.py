"""Sequence-sharded attention for whole-region encoding (SURVEY.md §5).

At whole-region scale (2048^2 px -> ~21k tokens at patch 14) a single
chip's attention is the quadratic term; sharding the *sequence* over the
mesh's ``model`` axis splits the q rows across chips while each chip
attends over the full gathered k/v — the classic all-gather-KV sequence
parallelism (per-chip attention FLOPs drop n_shard-fold; the gathered k/v
is only [B, S, H*D] bf16, which rides ICI). Everything token-local
(LayerNorm, MLP, projections) needs no communication at all under this
layout, so XLA's GSPMD handles the rest of the block automatically —
only the attention op needs the explicit ``shard_map``.

Reference point: the torch reference has no sequence story at all (fixed
324-token tiles, timm eager attention — src/generators/mipheivit.py);
this module is new TPU-native capability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.attention import flash_cross_attention


def seq_sharding(mesh: Mesh, axis: str = "model") -> NamedSharding:
    """[B, S, ...] arrays sharded on the token axis."""
    return NamedSharding(mesh, P(None, axis))


def seq_sharded_attention(qkv_or_q, k=None, v=None, *, num_heads: int,
                          mesh: Mesh, axis: str = "model"):
    """Attention over [B, S, H*D] tensors whose S axis is sharded on
    ``axis``. Accepts either a fused qkv buffer [B, S, 3*H*D] or separate
    q/k/v. Each shard all-gathers k/v (tiled over ICI) and runs the
    rectangular flash kernel on its local q rows; the output keeps the
    input's S sharding. Differentiable: the kernel's recompute-from-LSE
    backward + shard_map AD turn the k/v all-gather into the dK/dV
    reduce-scatter, so whole-region *training* shards over the mesh too
    (grads verified vs unsharded in tests/test_seq_shard.py).

    A global S not divisible by the axis size is zero-padded to the next
    multiple before the shard_map and sliced back after (the ViT-g region
    token count 73*73+5 = 5334 shards over 2/3/6 chips natively but needs
    the pad for 4/8); padded keys are masked inside the kernel.
    """
    n = mesh.shape[axis]
    s = qkv_or_q.shape[1]
    pad = (-s) % n
    fused = k is None
    args = (qkv_or_q,) if fused else (qkv_or_q, k, v)
    if pad:
        args = tuple(
            jnp.pad(t, ((0, 0), (0, pad), (0, 0))) for t in args)

    def local(*ts):
        if fused:
            q_l, k_l, v_l = jnp.split(ts[0], 3, axis=-1)
        else:
            q_l, k_l, v_l = ts
        b, s_l, hd = q_l.shape
        d = hd // num_heads
        k_f = jax.lax.all_gather(k_l, axis, axis=1, tiled=True)
        v_f = jax.lax.all_gather(v_l, axis, axis=1, tiled=True)

        def heads(t):
            return t.reshape(t.shape[0], t.shape[1], num_heads, d) \
                    .transpose(0, 2, 1, 3)

        out = flash_cross_attention(heads(q_l), heads(k_f), heads(v_f),
                                    seq_len_k=s)
        return out.transpose(0, 2, 1, 3).reshape(b, s_l, hd)

    spec = P(None, axis, None)
    # check_vma off: pallas_call out_shapes carry no varying-mesh-axes
    # annotation (jax 0.9), and the kernel output is trivially vma-correct
    # (each shard writes only its own q rows)
    out = jax.shard_map(local, mesh=mesh,
                        in_specs=(spec,) * len(args),
                        out_specs=spec, check_vma=False)(*args)
    return out[:, :s] if pad else out


_SEQ_CTX: list = []


class seq_shard_scope:
    """Routes ``ViTConfig.attn_impl="seq_shard"`` attention through
    ``seq_sharded_attention`` on this mesh/axis for the dynamic extent of
    the scope (the flax module tree can't carry a Mesh, so the whole-region
    driver opens this scope around ``model.apply``)::

        with seq_shard_scope(mesh):
            out = jax.jit(model.apply, ...)(variables, region)
    """

    def __init__(self, mesh: Mesh, axis: str = "model"):
        self.mesh, self.axis = mesh, axis

    def __enter__(self):
        _SEQ_CTX.append((self.mesh, self.axis))
        return self

    def __exit__(self, *exc):
        _SEQ_CTX.pop()
        return False


def current_seq_scope():
    if not _SEQ_CTX:
        raise RuntimeError(
            'attn_impl="seq_shard" requires an enclosing seq_shard_scope('
            "mesh) around model.apply")
    return _SEQ_CTX[-1]
