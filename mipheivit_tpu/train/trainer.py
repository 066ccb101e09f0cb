"""Training driver: the full ``run.py`` path (reference: src/train.py:34-210).

Wires dataframes + channel stats + normalizers + sampler + DataModule +
generator + losses + (optional) PatchGAN discriminator + optimizers into
the jitted GAN train step, runs the epoch loop with validation / cell
metrics / checkpoint monitoring, and exports both orbax snapshots and the
reference-format safetensors checkpoint.

TPU specifics: one compiled train step, batch sharded over the mesh
``data`` axis, params replicated; host input pipeline double-buffers
batches; the NaN guard dumps ``weights_nan.safetensors`` and raises
(reference: src/models.py:102-105).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Optional

import numpy as np
import pandas as pd

from ..config import Config, save_config
from ..data.dataset import DataModule
from ..data.pipeline import device_prefetch
from ..data.sampler import BalancedPositiveSampler
from ..data.stats import (
    Normalizer,
    get_effective_width_height,
    get_input_mean_std,
    load_channel_stats,
)
from ..metrics import PixelMetrics
from ..metrics.cell import CellMetrics
from ..models import get_generator
from ..models.discriminator import DiscriminatorPatch
from ..parallel import make_data_mesh, replicated
from ..utils import MetricsLogger, save_image_grid
from .cell_loss import build_cell_loss
from .checkpoints import (
    fetch_local,
    flax_state_dict,
    mipheivit_state_dict,
    save_safetensors,
    save_train_state,
)
from .losses import build_reconstruction_loss
from .optim import build_discriminator_optimizer, build_generator_optimizer
from .schedule import scaled_lr
from .steps import (
    StepConfig,
    create_train_state,
    make_eval_step,
    make_train_step,
)

log = logging.getLogger(__name__)


class _NullLogger:
    """Non-main hosts: metrics are identical across hosts (replicated
    state), so only process 0 writes them."""

    def log(self, *a, **k):
        pass

    def finish(self):
        pass


def get_width_height(dataframe) -> tuple:
    from_slide = "image_path" not in dataframe.columns
    if from_slide:
        return (int(dataframe["tile_size_x"].iloc[0]),
                int(dataframe["tile_size_y"].iloc[0]))
    from ..slideio import read_image

    sample = read_image(dataframe["image_path"].iloc[0])
    return sample.shape[1], sample.shape[0]


def swap_augmentation_replicas(dataframe, augmentation_dir: str, prob: float,
                               rng) -> pd.DataFrame:
    """CycleGAN-normalized replica swap: with probability ``prob`` a tile's
    image_path points at its stain-normalized copy for this epoch
    (reference: src/callbacks.py:152-224, wired at src/train.py:195-199)."""
    df = dataframe.copy()
    aug_dir = Path(augmentation_dir)
    mask = rng.random(len(df)) < prob
    for idx in np.flatnonzero(mask):
        orig = Path(df.iloc[idx]["image_path"])
        cand = aug_dir / orig.name
        if cand.exists():
            df.iat[idx, df.columns.get_loc("image_path")] = str(cand)
    return df


def train_patchgan(cfg: Config, logdir: str, dtype: Optional[str] = None,
                   max_steps_per_epoch: Optional[int] = None,
                   use_wandb: bool = True,
                   resume: bool = False,
                   profile_steps: int = 0) -> Dict:
    """``profile_steps`` > 0 captures a jax.profiler trace of that many
    train steps into <logdir>/profile (SURVEY.md §5: the reference has no
    profiling at all)."""
    import jax
    import jax.numpy as jnp

    logdir = Path(logdir)
    logdir.mkdir(parents=True, exist_ok=True)
    if dtype is None:
        dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"

    train_df = pd.read_csv(cfg.data.train_dataframe_path)
    val_df = pd.read_csv(cfg.data.val_dataframe_path)
    test_df = pd.read_csv(cfg.data.test_dataframe_path)
    log.info("%d train / %d val / %d test tiles",
             len(train_df), len(val_df), len(test_df))
    from_slide = "image_path" not in train_df.columns
    slide_df = (pd.read_csv(cfg.data.slide_dataframe_path)
                if cfg.data.slide_dataframe_path else None)
    channel_stats = load_channel_stats(cfg.data.channel_stats_path)

    width, height = get_width_height(train_df)
    width, height = get_effective_width_height(width, height, train=True)
    channel_names = list(cfg.data.targ_channel_names)
    nc_out = len(channel_names)
    targ_idxs = channel_stats.channel_idxs(channel_names)

    he_norm = Normalizer(get_input_mean_std(
        cfg.model.model_name, cfg.select("model.encoder.encoder_name"),
        channel_stats.rgb), mode="he")
    if_norm = Normalizer(mode="if")

    sampler_cfg = cfg.train.data_sampler
    sampler = None
    if sampler_cfg.use_sampler:
        sampler = BalancedPositiveSampler(
            train_df, channel_names, sampler_cfg.tresh,
            other_percent=sampler_cfg.other_percent)

    use_cell_metrics = bool(cfg.train.use_cell_metrics) and slide_df is not None
    dm = DataModule(
        slide_dataframe=slide_df, train_dataframe=train_df,
        val_dataframe=val_df, test_dataframe=test_df,
        targ_channel_idxs=targ_idxs, batch_size=cfg.train.batch_size,
        input_shape=(width, height), from_slide=from_slide,
        return_nuclei=use_cell_metrics, train_sampler=sampler,
        preprocess_input_fn=he_norm, preprocess_target_fn=if_norm,
        seed=cfg.train.seed)
    dm.setup()

    model = get_generator(cfg.model.model_name, width, 3, nc_out, cfg,
                          dtype=dtype)

    loss_reconstruct = build_reconstruction_loss(
        cfg, channel_names, channel_stats,
        train_dataframe=train_df if cfg.train.losses.use_weighted_mae else None)

    cell_loss_cfg = cfg.train.losses.cell_loss
    cell_loss_fn = None
    if cell_loss_cfg.use_loss:
        cell_loss_fn = build_cell_loss(
            cell_loss_cfg.mlp_path, nc_out, use_mse=cell_loss_cfg.use_mse,
            use_clustering=cell_loss_cfg.use_clustering,
            lambda_factor=cfg.train.losses.lambda_factor)

    gan_train = bool(cfg.train.gan_train)
    disc = None
    if gan_train:
        selected = None
        if cfg.train.gan_mode in ("structural", "stuctural"):
            mask = channel_stats.structural_mask(channel_names)
            selected = [i for i, m in enumerate(mask) if m]
        disc = DiscriminatorPatch(norm_layer_type=None,
                                  selected_channels=selected)

    # multi-host: each host loads batch_size samples and device_prefetch
    # assembles a batch_size * n_proc global batch, so every step consumes
    # bs * n_proc samples — the schedule, sqrt-batch LR, and resume-epoch
    # math all count in those units
    n_proc = jax.process_count()
    global_bs = cfg.train.batch_size * n_proc
    steps_per_epoch = len(train_df) // global_bs
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)
    accum = max(int(cfg.select("train.grad_accum_steps", 1) or 1), 1)
    # schedules count *optimizer* steps: with accumulation, k microbatch
    # steps advance the pix2pix schedule once
    total_iters = max(steps_per_epoch * cfg.train.epochs // accum, 1)

    # sqrt-batch LR scaling uses the effective batch (reference
    # src/train.py:163-164 semantics at the optimizer-step granularity)
    lr_g = scaled_lr(cfg.train.learning_rate_g, global_bs * accum)
    lr_d = scaled_lr(cfg.train.learning_rate_d, global_bs * accum)
    vit_lr_decay = cfg.model.model_name.startswith("unet") and \
        "lora" not in cfg.model.model_name and "frozen" not in cfg.model.model_name
    gen_opt = build_generator_optimizer(
        cfg.model.model_name, lr_g, total_iters, vit_lr_decay=vit_lr_decay,
        grad_accum_steps=accum)
    disc_opt = build_discriminator_optimizer(
        lr_d, total_iters, grad_accum_steps=accum) if gan_train else None

    cell_metrics = None
    if use_cell_metrics:
        cell_metrics = CellMetrics(slide_df, channel_names)

    step_cfg = StepConfig(
        gan_train=gan_train,
        lsgan=cfg.select("train.losses.adversarial_loss") == "lsgan",
        foreground_head=bool(cfg.train.foreground_head),
        use_cell_loss=cell_loss_fn is not None,
        freeze_model_name=cfg.model.model_name)

    seq_shard = cfg.select("model.attn_impl", "auto") == "seq_shard"
    if seq_shard:
        # whole-region training: tokens shard over the mesh's model axis
        # (parallel/seq.py), batch over the data axis. num_model_shards
        # comes from train.mesh (config.yaml); every step call below runs
        # inside seq_shard_scope so the attention shard_maps trace against
        # this mesh.
        from ..parallel import make_mesh

        n_model = int(cfg.train.mesh.num_model_shards)
        n_dev = len(jax.devices())
        if n_model < 2 or n_model > n_dev:
            raise ValueError(
                f"model.attn_impl=seq_shard needs train.mesh."
                f"num_model_shards in [2, {n_dev}] (sequence shards must "
                f"span >=2 devices and fit the {n_dev} visible devices); "
                f"got {n_model}. Set train.mesh.num_model_shards "
                "explicitly, or use attn_impl=auto for single-device "
                "attention.")
        n_data = max(n_dev // n_model, 1)
        mesh = make_mesh(n_data=n_data, n_model=n_model,
                         devices=jax.devices()[:n_data * n_model])
    else:
        mesh = make_data_mesh(cfg.train.batch_size)

    sample = next(iter(dm.loader("train", epoch=0)))
    batch0 = {"image": np.asarray(sample["image"], np.float32),
              "target": np.asarray(sample["target"], np.float32)}
    if use_cell_metrics and "nuclei" in sample:
        batch0["nuclei"] = sample["nuclei"]

    gen_variables = None
    if cfg.model.checkpoint_path:
        from ..infer.loading import load_generator as _load

        _, gen_variables = _load(cfg, str(Path(cfg.model.checkpoint_path).parent),
                                 (height, width), nc_out, dtype=dtype)

    def _build_state():
        return create_train_state(
            jax.random.PRNGKey(cfg.train.seed), model, gen_opt, disc,
            disc_opt, sample_batch=batch0, gen_variables=gen_variables,
            freeze_model_name=cfg.model.model_name,
            frozen_dtype=dtype if dtype != "float32" else None)

    if seq_shard:
        # model.init inside create_train_state traces the seq-sharded
        # attention, so it needs the scope just like the steps below
        from ..parallel.seq import seq_shard_scope

        with seq_shard_scope(mesh):
            state = _build_state()
    else:
        state = _build_state()

    start_epoch = 0
    if resume:
        # mid-training resume from the latest orbax snapshot (new
        # capability; the reference always restarts — SURVEY.md §5)
        from .checkpoints import latest_checkpoint, restore_train_state

        ckpt = latest_checkpoint(str(logdir / "orbax"))
        if ckpt:
            state = restore_train_state(ckpt, fetch_local(state))
            start_epoch = int(state.step) // max(steps_per_epoch, 1)
            log.info("resumed from %s at step %d (epoch %d)",
                     ckpt, int(state.step), start_epoch)

    # NOTE on buffer donation (measured dead end, r4): donating the carried
    # state (donate_argnums=(0, 2)) would spare XLA keeping input+output
    # state alive across the step boundary, but the freshly-initialized
    # state tree contains *aliased* leaves (JAX deduplicates identical
    # zero-init constants, e.g. Adam moments of equal shapes), and XLA
    # rejects donating one buffer twice ("Attempt to donate the same
    # buffer twice in Execute()"). Revisit only with an explicit
    # de-aliasing copy of the initial state AND of every fresh metrics
    # accumulator — and with an on-chip HBM number showing the 2x-state
    # peak actually binds.
    train_step = jax.jit(make_train_step(
        model, loss_reconstruct, gen_opt, disc, disc_opt, step_cfg,
        cell_loss_fn=cell_loss_fn))
    eval_step = jax.jit(make_eval_step(model, loss_reconstruct, step_cfg))
    if seq_shard:
        from ..parallel.seq import seq_shard_scope

        _ts, _es = train_step, eval_step

        def train_step(*a, _f=_ts):  # noqa: F811
            with seq_shard_scope(mesh):
                return _f(*a)

        def eval_step(*a, _f=_es):  # noqa: F811
            with seq_shard_scope(mesh):
                return _f(*a)

    if mesh is not None:
        state = jax.device_put(state, replicated(mesh))

    # multi-host: the state is replicated, so every host holds the same
    # values — exactly one process writes config/checkpoints/status/
    # images/metrics (shared-filesystem safety)
    is_main = jax.process_index() == 0
    if is_main:
        save_config(cfg, logdir / "config.yaml")
    logger = MetricsLogger(str(logdir), project=cfg.train.wandb_project,
                           run_name=logdir.name, config=cfg.to_dict(),
                           use_wandb=use_wandb) \
        if is_main else _NullLogger()

    monitor = cfg.train.callbacks.modelcheckpoint.monitor
    mode = cfg.train.callbacks.modelcheckpoint.mode
    best = -np.inf if mode == "max" else np.inf
    logreg_head = None
    history = []
    aug_rng = np.random.default_rng(cfg.train.seed)

    # Graceful preemption (TPU VMs get SIGTERM with a grace window): the
    # handler only sets a flag; the step loop snapshots the full train
    # state at the next step boundary, writes status.txt=preempted, and
    # exits cleanly so ``run.py --resume=<logdir>`` continues mid-run.
    # New capability — the reference's only exit path uploads the best
    # checkpoint and dies (src/callbacks.py:146-149).
    import signal as _signal

    preempt = {"sig": None}
    _prev_handlers = {}

    def _on_preempt(signum, frame):
        preempt["sig"] = signum
        log.warning("signal %d received — snapshotting at the next step "
                    "boundary", signum)

    try:
        _prev_handlers[_signal.SIGTERM] = _signal.signal(
            _signal.SIGTERM, _on_preempt)
    except ValueError:
        pass    # not the main thread (e.g. driven from a test harness)

    def _restore_handlers():
        for s, h in _prev_handlers.items():
            try:
                _signal.signal(s, h)
            except ValueError:
                pass

    def preempt_agreed() -> bool:
        """Hosts must leave the step loop TOGETHER: a host-local break
        would deadlock the others' collectives against orbax's save
        barrier. The flag is allgathered at synchronized points only
        (log_every boundaries + epoch end), so preemption response
        latency is bounded by log_every steps — well inside typical
        TPU-VM grace windows."""
        local = preempt["sig"] is not None
        if n_proc == 1:
            return local
        from jax.experimental import multihost_utils

        return bool(multihost_utils.process_allgather(
            np.array([local])).any())

    # the handler must not outlive this run, including on exceptions
    try:

        def run_eval(split: str, epoch: int) -> Dict:
            nonlocal logreg_head
            metrics = PixelMetrics.zeros()
            losses = []
            loader = dm.loader(split, epoch=epoch)
            loader.pad_to_batch = True   # fixed shapes: one compilation, mesh-safe
            for batch in device_prefetch(loader, mesh=mesh, size=2):
                b = {"image": batch["image"], "target": batch["target"],
                     "mask": batch["mask"]}
                metrics, elog = eval_step(state, b, metrics)
                losses.append(float(elog["gen_loss_sim"]))
                if use_cell_metrics and "nuclei" in batch:
                    n_valid = int(np.asarray(batch["mask"]).sum())
                    cell_metrics.update(elog["pred"][:n_valid],
                                        batch["nuclei"][:n_valid],
                                        batch["slide_name"][:n_valid])
            out = {f"{split}_{k}": float(v) for k, v in metrics.compute().items()}
            out[f"{split}_gen_loss_sim"] = float(np.mean(losses)) if losses else np.nan
            if use_cell_metrics:
                head = logreg_head if split == "test" else None
                cm = cell_metrics.compute(logreg_head=head)
                if split == "val":
                    logreg_head = cm["logreg_head"]
                for key in ("auc", "auc_logreg", "balanced_acc", "f1"):
                    out[f"{split}_cell_{key}"] = float(cm[key])
                for marker_col in cell_metrics.marker_cols:
                    for key in ("auc", "auc_logreg", "balanced_acc", "f1"):
                        mk = f"{marker_col}_{key}"
                        if mk in cm:
                            out[f"{split}_cell_{key}_{marker_col}"] = float(cm[mk])
            return out

        def export_checkpoint(tag: str):
            # orbax participates on every process (it barriers internally);
            # the plain-file safetensors export is main-only
            save_train_state(state, str(logdir / "orbax"), step=int(state.step))
            if not is_main:
                return
            params = fetch_local(state.gen_params)
            stats = fetch_local(state.gen_batch_stats)
            if cfg.model.model_name.startswith("myvitmatte"):
                # reference-format export (HF-compatible key layout)
                sd = mipheivit_state_dict(params, stats, model.vit_cfg, nc_out)
            else:
                # every generator exports a checkpoint (reference
                # src/callbacks.py:121-149 saves each generator's state dict);
                # non-MIPHEI models use the flattened flax layout
                sd = flax_state_dict(params, stats)
            save_safetensors(sd, str(logdir / f"{tag}.safetensors"))

        global_step = int(state.step)
        for epoch in range(start_epoch, cfg.train.epochs):
            if cfg.data.augmentation_dir and not from_slide:
                dm.frames["train"] = swap_augmentation_replicas(
                    train_df, cfg.data.augmentation_dir, 0.25, aug_rng)
                dm.setup()
            train_metrics = PixelMetrics.zeros()
            if mesh is not None:
                train_metrics = jax.device_put(train_metrics, replicated(mesh))
            loader = dm.loader("train", epoch=epoch)
            host_cap = None
            if n_proc > 1:
                # multi-host: each host walks a disjoint shard of the epoch
                # (SURVEY.md §5: per-host tile sharding is the DCN-side analog
                # of the reference's DataLoader sharding)
                loader.shard(jax.process_index(), n_proc)
                # SPMD: hosts must dispatch identical step counts per
                # epoch; shards can differ by one sample, so truncate all
                # hosts to the smallest shard's batch count
                host_cap = (len(train_df) // n_proc) // cfg.train.batch_size
            # Device-side loss/NaN accumulation: the hot loop must dispatch
            # ahead of the device, so no per-step float()/bool() host syncs
            # (each would block until the step finishes and defeat
            # device_prefetch's double-buffer). Scalars are summed on device
            # with tiny async ops and fetched once every ``log_every`` steps;
            # the NaN guard piggybacks on the same fetch (reference checks
            # every step — src/models.py:102-105 — but is sync-bound by it).
            log_every = 50
            slog_sums: Optional[Dict] = None
            slog_last: Optional[Dict] = None
            nan_any = None
            nan_step = None   # device-side min step index with a NaN output
            _NO_NAN = np.int32(np.iinfo(np.int32).max)
            slog_count = 0

            def sync_and_check_nan():
                """One blocking fetch: latest scalars + OR of all NaN flags
                since the last check. Returns the latest host-side scalars.

                The first-NaN step index is tracked on device (a min over
                per-step ``where(nan, step, INT_MAX)``) so the forensic export
                names the offending step exactly even though the fetch only
                happens every ``log_every`` steps — same forensics as the
                reference's per-step check (src/models.py:102-105) without its
                per-step host sync."""
                nonlocal nan_any
                if slog_last is None:
                    return {}
                fetched = jax.device_get(
                    {"last": slog_last, "nan": nan_any, "nan_step": nan_step})
                if bool(fetched["nan"]):
                    first = int(fetched["nan_step"])
                    export_checkpoint("weights_nan")
                    if is_main:
                        (logdir / "weights_nan.step").write_text(f"{first}\n")
                    raise ValueError(
                        f"Nan found (first at step {first})"
                    )  # reference: models.py:105
                return {k: float(v) for k, v in fetched["last"].items()}

            for i, batch in enumerate(device_prefetch(loader, mesh=mesh, size=2)):
                if max_steps_per_epoch and i >= max_steps_per_epoch:
                    break
                if host_cap is not None and i >= host_cap:
                    break
                if n_proc == 1 and preempt["sig"] is not None:
                    break
                b = {"image": batch["image"], "target": batch["target"]}
                if step_cfg.use_cell_loss:
                    b["nuclei"] = batch["nuclei"]
                if profile_steps and global_step == 2:
                    jax.profiler.start_trace(str(logdir / "profile"))
                state, train_metrics, slog = train_step(state, b, train_metrics)
                global_step += 1
                if profile_steps and global_step == 2 + profile_steps:
                    jax.block_until_ready(slog["gen_loss"])
                    jax.profiler.stop_trace()
                    log.info("profiler trace -> %s", logdir / "profile")
                nan_flag = slog["nan"]
                scalars = {k: v for k, v in slog.items() if k != "nan"}
                slog_last = scalars
                slog_count += 1
                step_if_nan = jnp.where(nan_flag, jnp.int32(global_step), _NO_NAN)
                if slog_sums is None:
                    slog_sums = scalars
                    nan_any = nan_flag
                    nan_step = step_if_nan
                else:
                    slog_sums = jax.tree.map(jnp.add, slog_sums, scalars)
                    nan_any = jnp.logical_or(nan_any, nan_flag)
                    nan_step = jnp.minimum(nan_step, step_if_nan)
                if global_step % log_every == 0:
                    logger.log(sync_and_check_nan(), step=global_step)
                    if n_proc > 1 and preempt_agreed():
                        break
                if global_step % 1000 == 1 and n_proc == 1:
                    # debug image dump: single-host only (the eval output
                    # is sharded across hosts; np.asarray cannot fetch
                    # non-addressable shards)
                    pred = np.asarray(
                        eval_step(state, b, PixelMetrics.zeros())[1]["pred"])
                    save_image_grid(
                        str(logdir / "logs_img" / f"step{global_step}.png"),
                        he_norm.unormalize(np.asarray(batch["image"])),
                        pred, np.asarray(b["target"]))
            sync_and_check_nan()  # end-of-epoch NaN check + drain
            if preempt_agreed():
                save_train_state(state, str(logdir / "orbax"),
                                 step=int(state.step))
                if is_main:
                    (logdir / "status.txt").write_text("preempted")
                log.warning("preempted at step %d — resume with "
                            "run.py --resume=%s", int(state.step), logdir)
                logger.finish()
                return {"history": history, "best": best, "state": state,
                        "preempted": True}
            epoch_metrics = {f"train_{k}": float(v)
                             for k, v in train_metrics.compute().items()}
            if slog_sums is not None:
                sums = jax.device_get(slog_sums)
                epoch_metrics.update(
                    {k: float(v) / slog_count for k, v in sums.items()})
            epoch_metrics.update(loader.stats.snapshot())
            epoch_metrics.update(run_eval("val", epoch))
            epoch_metrics["epoch"] = epoch
            logger.log(epoch_metrics, step=global_step)
            history.append(epoch_metrics)
            log.info("epoch %d: %s", epoch,
                     {k: round(v, 4) for k, v in epoch_metrics.items()
                      if isinstance(v, float)})

            score = epoch_metrics.get(monitor)
            if score is not None and (
                    (mode == "max" and score > best) or
                    (mode == "min" and score < best)):
                best = score
                export_checkpoint("model")
                log.info("new best %s=%.4f -> checkpoint saved", monitor, best)

        test_metrics = run_eval("test", cfg.train.epochs)
        logger.log(test_metrics, step=global_step)
        history.append(test_metrics)
        if is_main:
            (logdir / "status.txt").write_text("finished")  # reference: run.py:38-45
        logger.finish()
        return {"history": history, "best": best, "state": state}
    finally:
        _restore_handlers()
