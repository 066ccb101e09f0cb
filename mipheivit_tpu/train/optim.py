"""Optimizers, trainability masks, layer-wise LR decay.

Reference recipe (src/models.py:348-387): Adam(0.5, 0.999, eps 1e-7), the
pix2pix warmup/hold/decay LR schedule stepped per iteration, global-norm
grad clip 1.0 (src/models.py:136), sqrt-batch LR scaling (src/train.py:163),
and 0.65 layer-wise decay when a ViT encoder is fully trainable
(src/models.py:349-358). Frozen-parameter semantics (LoRA mode freezes the
foundation encoder except adapters — src/generators/lora.py:66-83) are a
``zero_updates``-masked transform, so frozen weights stay bit-identical.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import optax

from .schedule import pix2pix_schedule


def path_of(keypath) -> str:
    parts = []
    for k in keypath:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def is_trainable(path: str, model_name: str) -> bool:
    """myvitmatte: encoder frozen except LoRA adapters; decoder trainable
    (reference: mipheivit get_vitmatte + apply_lora). unet_lora: same.
    unet_frozen: whole encoder frozen but feature upsampler trainable
    (reference: unet.py:69-75). Others: all trainable."""
    if model_name.startswith("myvitmatte") or "lora" in model_name:
        if path.startswith("encoder/"):
            return "lora_q" in path or "lora_v" in path or \
                "feature_upsampler" in path
        return True
    if "frozen" in model_name:
        if path.startswith("encoder/") and "feature_upsampler" not in path:
            return False
        return True
    return True


def trainable_mask(params, model_name: str) -> Dict:
    """True = trainable (see ``is_trainable``)."""
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: is_trainable(path_of(kp), model_name), params)


def layer_decay_multiplier(path: str, leaf, lr_decay_rate: float,
                           num_layers: int):
    if "pos_embed" in path or "patch_embed" in path or "cls_token" in path \
            or "reg_token" in path:
        return jnp.asarray(lr_decay_rate ** (num_layers + 1), jnp.float32)
    if "/blocks/" in path or path.startswith("blocks/"):
        # scanned: leading axis = layer index i -> decay^(num_layers - i)
        exps = num_layers - jnp.arange(num_layers)
        mult = lr_decay_rate ** exps.astype(jnp.float32)
        shape = (num_layers,) + (1,) * (leaf.ndim - 1)
        return mult.reshape(shape)
    return jnp.asarray(1.0, jnp.float32)


def _scale_by_layer_decay(lr_decay_rate: float,
                          num_layers: int) -> optax.GradientTransformation:
    """Lazy layer-decay scaling: multipliers derived from update paths."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        out = jax.tree_util.tree_map_with_path(
            lambda kp, u: u * layer_decay_multiplier(
                path_of(kp), u, lr_decay_rate, num_layers).astype(u.dtype),
            updates,
        )
        return out, state

    return optax.GradientTransformation(init, update)


def masked_updates(model_name: str) -> optax.GradientTransformation:
    """Zero updates on frozen paths (keeps frozen params bit-exact). The
    mask is derived lazily from the update pytree's own paths."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        out = jax.tree_util.tree_map_with_path(
            lambda kp, u: u if is_trainable(path_of(kp), model_name)
            else jnp.zeros_like(u),
            updates,
        )
        return out, state

    return optax.GradientTransformation(init, update)


def build_generator_optimizer(
    model_name: str,
    lr: float,
    total_iters: int,
    vit_lr_decay: bool = False,
    num_layers: int = 40,
    warmup_iters: int = 400,
    grad_accum_steps: int = 1,
) -> optax.GradientTransformation:
    chain = [optax.clip_by_global_norm(1.0)]
    if vit_lr_decay:
        chain.append(_scale_by_layer_decay(0.65, num_layers))
    chain += [
        optax.scale_by_adam(b1=0.5, b2=0.999, eps=1e-7),
        optax.scale_by_schedule(
            pix2pix_schedule(1.0, total_iters, warmup_iters)
        ),
        optax.scale(-lr),
        masked_updates(model_name),
    ]
    return _maybe_accumulate(optax.chain(*chain), grad_accum_steps)


def build_discriminator_optimizer(lr: float, total_iters: int,
                                  warmup_iters: int = 400,
                                  grad_accum_steps: int = 1):
    return _maybe_accumulate(optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.scale_by_adam(b1=0.5, b2=0.999, eps=1e-7),
        optax.scale_by_schedule(pix2pix_schedule(1.0, total_iters, warmup_iters)),
        optax.scale(-lr),
    ), grad_accum_steps)


def _maybe_accumulate(opt: optax.GradientTransformation,
                      grad_accum_steps: int):
    """Gradient accumulation (``train.grad_accum_steps``): k microbatches'
    mean grads feed one inner-optimizer step, so the reference's
    effective batch (configs/config.yaml:17-23, batch 16) fits on chips
    where only a smaller per-step batch compiles under the chosen remat
    policy. Mean-of-microbatch-mean grads equals the full-batch grad for
    equal microbatches; BatchNorm stats and the discriminator's
    power-iteration/label-noise draws still advance per microbatch
    (documented deviation — the reference has no accumulation at all).
    The accumulator allocates one grad-sized buffer for the *trainable*
    partition only (the frozen encoder is outside the optimizer)."""
    if grad_accum_steps <= 1:
        return opt
    return optax.MultiSteps(opt, every_k_schedule=int(grad_accum_steps))


def partition_params(params, model_name: str):
    """Split a param tree into (trainable, frozen) sub-trees by
    ``is_trainable``.

    TPU-first memory shape for LoRA/frozen training: the train step
    differentiates and the optimizer tracks ONLY the trainable sub-tree,
    so Adam never allocates moments for the frozen 1.1B-param foundation
    encoder (~9 GB f32 on ViT-g) and the backward skips its dW matmuls.
    The reference gets the same economy from torch's requires_grad=False
    (src/generators/lora.py:66-83); here it falls out of the functional
    partition. Both returned trees keep original nesting, so path-based
    transforms (layer decay, masked_updates) still see canonical names.
    """
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    t, f = {}, {}
    for key, leaf in flat.items():
        path = "/".join(str(k) for k in key)
        (t if is_trainable(path, model_name) else f)[key] = leaf
    return traverse_util.unflatten_dict(t), traverse_util.unflatten_dict(f)


def combine_params(trainable, frozen):
    """Inverse of ``partition_params``."""
    from flax import traverse_util

    flat = dict(traverse_util.flatten_dict(frozen))
    flat.update(traverse_util.flatten_dict(trainable))
    return traverse_util.unflatten_dict(flat)
