"""Compiled train / eval / predict steps.

Functional rebuild of the reference Lightning module's manual dual-optimizer
GAN loop (reference: src/models.py:87-205): generator step (reconstruction +
optional adversarial + optional cell loss + optional foreground focal loss,
grad-clip 1.0, per-step LR schedule), then discriminator step on detached
fakes with 0.05 label noise, plus streaming pixel metrics and the NaN guard.

Everything lives in one ``TrainState`` pytree and one jitted ``train_step``.
Parallelism is by sharding, not by code: the batch is sharded over the mesh
``data`` axis, params are replicated, and XLA inserts the gradient
all-reduce — the same step runs single-chip or on a v5e-8 unchanged.

Note the reference's inverted GAN label convention is preserved exactly:
the discriminator is trained toward fake=1 / real=0 and the generator
minimizes BCE(D(fake), 0) (reference: src/models.py:109,158-165).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from .losses import adversarial_loss, focal_bce_loss
from ..metrics.pixel import PixelMetrics


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    gen_params: Any
    gen_batch_stats: Any
    gen_opt_state: Any
    disc_params: Any = None
    disc_spectral: Any = None
    disc_opt_state: Any = None
    rng: Any = None


@dataclasses.dataclass(frozen=True)
class StepConfig:
    gan_train: bool = False
    lsgan: bool = False
    foreground_head: bool = False
    use_cell_loss: bool = False
    cell_capacity: int = 1024
    data_range: tuple = (-0.9, 0.9)
    # model name driving the trainable/frozen partition (optim.is_trainable).
    # When set, the train step differentiates and the optimizer tracks only
    # the trainable sub-tree — no grads or Adam moments for the frozen
    # foundation encoder (torch requires_grad economy; ~14 GB saved on
    # ViT-g). None = legacy full-tree behavior.
    freeze_model_name: Optional[str] = None


def create_train_state(rng, model, gen_optimizer, disc=None,
                       disc_optimizer=None, sample_batch=None,
                       gen_variables=None, freeze_model_name=None,
                       frozen_dtype=None):
    """Initialize (or adopt imported) generator variables + optimizers.

    ``frozen_dtype`` (e.g. "bfloat16"): storage dtype for the frozen
    sub-tree. Frozen weights never update, and the forward casts them to
    the compute dtype anyway, so keeping an f32 master copy of a frozen
    1.1B-param encoder wastes ~2.3 GB of HBM plus a per-step convert temp
    — storing them in the compute dtype is bit-identical in the step.
    """
    from .optim import combine_params, partition_params

    x = sample_batch["image"]
    if gen_variables is None:
        gen_variables = model.init(rng, x, train=False)
    gen_params = gen_variables["params"]
    gen_bs = gen_variables.get("batch_stats", {})
    if freeze_model_name is None:
        opt_params = gen_params
    else:
        opt_params, frozen = partition_params(gen_params, freeze_model_name)
        if frozen_dtype is not None:
            frozen = jax.tree.map(
                lambda p: p.astype(frozen_dtype) if jnp.issubdtype(
                    p.dtype, jnp.floating) else p, frozen)
            gen_params = combine_params(opt_params, frozen)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        gen_batch_stats=gen_bs,
        gen_opt_state=gen_optimizer.init(opt_params),
        rng=rng,
    )
    if disc is not None:
        y = sample_batch["target"]
        dvars = disc.init(jax.random.fold_in(rng, 1), x, y, train=False)
        state.disc_params = dvars["params"]
        state.disc_spectral = dvars.get("spectral", {})
        state.disc_opt_state = disc_optimizer.init(dvars["params"])
    return state


def make_train_step(model, loss_reconstruct: Callable, gen_optimizer,
                    disc=None, disc_optimizer=None,
                    cfg: StepConfig = StepConfig(),
                    cell_loss_fn: Optional[Callable] = None):
    """Build the jitted train step: (state, batch, metrics) -> (state, metrics, aux).

    batch: {"image": [B,H,W,3], "target": [B,H,W,C], optional "nuclei": [B,H,W]}.
    """
    from .optim import combine_params, partition_params

    fg_loss = focal_bce_loss(alpha=0.75, gamma=2.0)

    def gen_loss_fn(gen_params, state, batch, rng, frozen=None):
        x, y = batch["image"], batch["target"]
        if frozen is not None:
            gen_params = combine_params(gen_params, frozen)
        variables = {"params": gen_params, "batch_stats": state.gen_batch_stats}
        out, mutated = model.apply(
            variables, x, train=True, mutable=["batch_stats"],
            # dropout-carrying generators (SMP U-Net decoder blocks,
            # reference configs/model/unet.yaml dropout: 0.1) draw from the
            # per-step rng; models without dropout ignore it
            rngs={"dropout": rng},
        )
        if cfg.foreground_head:
            fake, fg_logits = out
        else:
            fake = out
        loss_sim = loss_reconstruct(y, fake)
        loss = loss_sim
        adv = jnp.zeros((), jnp.float32)
        if cfg.gan_train:
            logits = disc.apply(
                {"params": state.disc_params, "spectral": state.disc_spectral},
                x, fake, train=False,
            )
            # generator drives D(fake) toward 0 (reference convention)
            adv = adversarial_loss(logits, jnp.zeros_like(logits), cfg.lsgan)
            loss = loss + adv
        cell = jnp.zeros((), jnp.float32)
        if cfg.use_cell_loss and cell_loss_fn is not None:
            cell = cell_loss_fn(fake, y, batch["nuclei"])
            loss = loss + cell
        fg = jnp.zeros((), jnp.float32)
        if cfg.foreground_head:
            target_fg = (y > cfg.data_range[0]).astype(y.dtype)
            fg = fg_loss(fg_logits, target_fg)
            loss = loss + fg
        aux = {
            "fake": fake,
            "new_batch_stats": mutated["batch_stats"],
            "loss_sim": loss_sim,
            "loss_adv": adv,
            "loss_cell": cell,
            "loss_fg": fg,
        }
        return loss, aux

    def disc_loss_fn(disc_params, state, batch, fake, rng):
        x, y = batch["image"], batch["target"]
        variables = {"params": disc_params, "spectral": state.disc_spectral}
        logits_fake, mut = disc.apply(
            variables, x, jax.lax.stop_gradient(fake), train=True,
            mutable=["spectral"],
        )
        logits_real, mut = disc.apply(
            {"params": disc_params, "spectral": mut["spectral"]}, x, y,
            train=True, mutable=["spectral"],
        )
        k1, k2 = jax.random.split(rng)
        # label noise 0.05, clipped (reference: src/models.py:158-165)
        fake_labels = jnp.clip(
            jnp.ones_like(logits_fake)
            + 0.05 * jax.random.uniform(k1, logits_fake.shape), 0.0, 1.0)
        real_labels = jnp.clip(
            jnp.zeros_like(logits_real)
            + 0.05 * jax.random.uniform(k2, logits_real.shape), 0.0, 1.0)
        d_loss = (adversarial_loss(logits_fake, fake_labels, cfg.lsgan)
                  + adversarial_loss(logits_real, real_labels, cfg.lsgan)) / 2.0
        return d_loss, {"spectral": mut["spectral"],
                        "logits_fake": logits_fake,
                        "logits_real": logits_real}

    def train_step(state: TrainState, batch, metrics: PixelMetrics):
        rng, g_rng, d_rng = jax.random.split(state.rng, 3)
        if cfg.freeze_model_name is not None:
            # grads / moments / updates only for the trainable sub-tree;
            # frozen weights are a closed-over constant of the backward
            trainable, frozen = partition_params(
                state.gen_params, cfg.freeze_model_name)
            (loss, aux), grads = jax.value_and_grad(
                gen_loss_fn, has_aux=True)(
                trainable, state, batch, g_rng, frozen)
            updates, new_gen_opt = gen_optimizer.update(
                grads, state.gen_opt_state, trainable)
            new_gen_params = combine_params(
                optax.apply_updates(trainable, updates), frozen)
        else:
            (loss, aux), grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
                state.gen_params, state, batch, g_rng
            )
            updates, new_gen_opt = gen_optimizer.update(
                grads, state.gen_opt_state, state.gen_params
            )
            new_gen_params = optax.apply_updates(state.gen_params, updates)

        nan_flag = jnp.isnan(aux["fake"]).any()

        log = {
            "gen_loss": loss,
            "gen_loss_sim": aux["loss_sim"],
            "gen_adv_loss": aux["loss_adv"],
            "loss_cell": aux["loss_cell"],
            "gen_foreground_loss": aux["loss_fg"],
            "nan": nan_flag,
        }

        new_state = TrainState(
            step=state.step + 1,
            gen_params=new_gen_params,
            gen_batch_stats=aux["new_batch_stats"],
            gen_opt_state=new_gen_opt,
            disc_params=state.disc_params,
            disc_spectral=state.disc_spectral,
            disc_opt_state=state.disc_opt_state,
            rng=rng,
        )
        if cfg.gan_train:
            (d_loss, d_aux), d_grads = jax.value_and_grad(
                disc_loss_fn, has_aux=True
            )(state.disc_params, new_state, batch, aux["fake"], d_rng)
            d_updates, new_disc_opt = disc_optimizer.update(
                d_grads, state.disc_opt_state, state.disc_params
            )
            new_state.disc_params = optax.apply_updates(
                state.disc_params, d_updates)
            new_state.disc_spectral = d_aux["spectral"]
            new_state.disc_opt_state = new_disc_opt
            log["disc_adv_loss"] = d_loss

        metrics = metrics.update(
            jnp.clip(aux["fake"], *cfg.data_range), batch["target"],
            cfg.data_range,
        )
        return new_state, metrics, log

    return train_step


def make_eval_step(model, loss_reconstruct: Callable,
                   cfg: StepConfig = StepConfig()):
    def eval_step(state: TrainState, batch, metrics: PixelMetrics):
        x, y = batch["image"], batch["target"]
        variables = {"params": state.gen_params,
                     "batch_stats": state.gen_batch_stats}
        out = model.apply(variables, x, train=False)
        fake = out[0] if cfg.foreground_head else out
        loss_sim = loss_reconstruct(y, fake)
        metrics = metrics.update(
            jnp.clip(fake, *cfg.data_range), y, cfg.data_range,
            mask=batch.get("mask"))
        return metrics, {"gen_loss_sim": loss_sim, "pred": fake}

    return eval_step


def make_predict_step(model, foreground_head: bool = False):
    def predict_step(state: TrainState, batch):
        variables = {"params": state.gen_params,
                     "batch_stats": state.gen_batch_stats}
        out = model.apply(variables, batch["image"], train=False)
        return out[0] if foreground_head else out

    return predict_step
