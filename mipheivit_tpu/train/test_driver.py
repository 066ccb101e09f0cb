"""Eval-only driver (reference: src/test.py:30-152): same wiring as the
trainer but loads a finished checkpoint and runs val + test epochs only,
writing ``test_dataframe_cell.csv`` beside the checkpoint when cell metrics
are on (reference: src/models.py:340-346)."""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Optional

import numpy as np
import pandas as pd

from ..data.dataset import DataModule
from ..data.pipeline import device_prefetch
from ..data.stats import (
    Normalizer,
    get_effective_width_height,
    get_input_mean_std,
    load_channel_stats,
)
from ..metrics import PixelMetrics
from ..metrics.cell import CellMetrics
from ..infer.loading import load_generator
from ..utils import MetricsLogger
from .losses import build_reconstruction_loss
from .steps import TrainState, StepConfig, make_eval_step
from .trainer import get_width_height

log = logging.getLogger(__name__)


def test_model(cfg, checkpoint_dir: str, run_name: str,
               dtype: Optional[str] = None) -> Dict:
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"

    val_df = pd.read_csv(cfg.data.val_dataframe_path)
    test_df = pd.read_csv(cfg.data.test_dataframe_path)
    slide_df = (pd.read_csv(cfg.data.slide_dataframe_path)
                if cfg.data.slide_dataframe_path else None)
    channel_stats = load_channel_stats(cfg.data.channel_stats_path)
    from_slide = "image_path" not in test_df.columns

    width, height = get_width_height(test_df)
    width, height = get_effective_width_height(width, height, train=True)
    channel_names = list(cfg.data.targ_channel_names)
    nc_out = len(channel_names)

    he_norm = Normalizer(get_input_mean_std(
        cfg.model.model_name, cfg.select("model.encoder.encoder_name"),
        channel_stats.rgb), mode="he")
    use_cell_metrics = bool(cfg.train.use_cell_metrics) and slide_df is not None

    dm = DataModule(
        slide_dataframe=slide_df, train_dataframe=val_df,
        val_dataframe=val_df, test_dataframe=test_df,
        targ_channel_idxs=channel_stats.channel_idxs(channel_names),
        batch_size=cfg.train.batch_size, input_shape=(width, height),
        from_slide=from_slide, return_nuclei=use_cell_metrics,
        preprocess_input_fn=he_norm, preprocess_target_fn=Normalizer(mode="if"))
    dm.setup()

    model, variables = load_generator(cfg, checkpoint_dir, (height, width),
                                      nc_out, dtype=dtype)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       gen_params=variables["params"],
                       gen_batch_stats=variables.get("batch_stats", {}),
                       gen_opt_state=None)
    loss_fn = build_reconstruction_loss(cfg, channel_names, channel_stats,
                                        train_dataframe=val_df)
    eval_step = jax.jit(make_eval_step(model, loss_fn, StepConfig(
        foreground_head=bool(cfg.train.foreground_head))))

    cell_metrics = CellMetrics(slide_df, channel_names) if use_cell_metrics \
        else None
    logger = MetricsLogger(checkpoint_dir, run_name=run_name, use_wandb=False)
    results: Dict = {}
    logreg_head = None
    for split in ("val", "test"):
        metrics = PixelMetrics.zeros()
        losses = []
        loader = dm.loader(split)
        loader.pad_to_batch = True
        for batch in device_prefetch(loader, size=2):
            b = {"image": batch["image"], "target": batch["target"],
                 "mask": batch["mask"]}
            metrics, elog = eval_step(state, b, metrics)
            losses.append(float(elog["gen_loss_sim"]))
            if cell_metrics is not None and "nuclei" in batch:
                n_valid = int(np.asarray(batch["mask"]).sum())
                cell_metrics.update(elog["pred"][:n_valid],
                                    batch["nuclei"][:n_valid],
                                    batch["slide_name"][:n_valid])
        out = {f"{split}_{k}": float(v) for k, v in metrics.compute().items()}
        out[f"{split}_gen_loss_sim"] = float(np.mean(losses)) if losses else np.nan
        if cell_metrics is not None:
            if split == "val":
                cm = cell_metrics.compute()
                logreg_head = cm["logreg_head"]
            else:
                cm, cell_df = cell_metrics.compute(
                    logreg_head=logreg_head, return_dataframe=True)
                cell_df.to_csv(Path(checkpoint_dir) / "test_dataframe_cell.csv",
                               index=False)
            for key in ("auc", "auc_logreg", "balanced_acc", "f1"):
                out[f"{split}_cell_{key}"] = float(cm[key])
        logger.log(out)
        results.update(out)
        log.info("%s: %s", split, {k: round(v, 4) for k, v in out.items()})
    logger.finish()
    return results
