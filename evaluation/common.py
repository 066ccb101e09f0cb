"""Shared plumbing for the evaluation scripts (reference: evaluation/*.py)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent.parent))

from mipheivit_tpu.config import load_yaml          # noqa: E402
from mipheivit_tpu.data.augment import SpatialAugment  # noqa: E402
from mipheivit_tpu.data.dataset import TileImg2ImgDataset  # noqa: E402
from mipheivit_tpu.data.pipeline import Loader, device_prefetch  # noqa: E402
from mipheivit_tpu.data.stats import (                # noqa: E402
    Normalizer,
    get_input_mean_std,
    load_channel_stats,
)
from mipheivit_tpu.infer.loading import load_generator  # noqa: E402
from mipheivit_tpu.metrics.cell import CellMetrics   # noqa: E402


def load_eval_config(checkpoint_dir: str, dataset_config_path: str):
    cfg = load_yaml(str(Path(checkpoint_dir) / "config.yaml"))
    if dataset_config_path and Path(dataset_config_path).exists():
        ds = load_yaml(dataset_config_path)
        body = ds.select("data", ds)
        for key in ("slide_dataframe_path", "train_dataframe_path",
                    "val_dataframe_path", "test_dataframe_path",
                    "channel_stats_path"):
            if key in body:
                cfg.data[key] = body[key]
    return cfg


def build_forward(cfg, checkpoint_dir: str, width: int, height: int,
                  nc_out: int):
    import jax

    dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
    model, variables = load_generator(cfg, checkpoint_dir, (height, width),
                                      nc_out, dtype=dtype)
    fwd = jax.jit(lambda x: model.apply(variables, x, train=False))
    return fwd


def run_cell_accumulation(cfg, fwd, dataframe, slide_dataframe,
                          crop: int = 256, batch_size: int = 4,
                          scale_factor: float = 1.0,
                          slide_key: str = "slide_name",
                          he_norm: Normalizer | None = None):
    """Stream tiles through the generator, pooling per-nucleus stats.

    ``scale_factor`` < 1 runs inference at a downsampled resolution and
    bilinearly re-upsamples predictions (eval_hemit 20x trick — reference:
    evaluation/eval_hemit.py:157-166, 216-219). ``he_norm`` overrides the
    config-derived input normalization (the immucan hemit-pipeline eval
    uses the pix2pix 127.5 constants — reference:
    eval_immucan_hemit_pipeline.py:125-126).
    """
    from mipheivit_tpu.ops.resize import resize_bilinear

    if he_norm is None:
        channel_stats = load_channel_stats(cfg.data.channel_stats_path)
        he_norm = Normalizer(get_input_mean_std(
            cfg.model.model_name, cfg.select("model.encoder.encoder_name"),
            channel_stats.rgb), mode="he")
    dataset = TileImg2ImgDataset(
        dataframe, preprocess_input_fn=he_norm,
        spatial_augmentations=SpatialAugment(crop, crop, training=False),
        return_nuclei=True)
    loader = Loader(dataset, batch_size, shuffle=False, drop_last=False,
                    num_workers=4, pad_to_batch=True)

    cell_metrics = CellMetrics(slide_dataframe,
                               marker_names=list(cfg.data.targ_channel_names),
                               min_area=20)

    if scale_factor != 1.0:
        base_fwd = fwd

        def fwd(x):  # noqa: F811
            h, w = x.shape[1], x.shape[2]
            ih, iw = int(h * scale_factor), int(w * scale_factor)
            xs = resize_bilinear(x.transpose(0, 3, 1, 2), (ih, iw))
            out = base_fwd(xs.transpose(0, 2, 3, 1))
            out = resize_bilinear(out.transpose(0, 3, 1, 2), (h, w))
            return out.transpose(0, 2, 3, 1)

    for batch in device_prefetch(loader, size=2):
        out = fwd(batch["image"])
        n = int(np.asarray(batch["mask"]).sum())
        key = batch[slide_key] if slide_key in batch else batch["tile_name"]
        cell_metrics.update(out[:n], batch["nuclei"][:n], key[:n])
    return cell_metrics


def results_dataframe(results):
    return pd.DataFrame(
        results, columns=["Marker", "ROC AUC", "Balanced Accuracy", "F1 Score"])


def train_xgboost_or_none(train_df, test_df, cell_metrics):
    """XGBoost gating classifier (reference: eval_orion.py:92-125); returns
    (model_dict, results_df) or (None, None) when xgboost isn't installed."""
    try:
        from xgboost import XGBClassifier
    except ImportError:
        print("xgboost not available; skipping XGBoost gating "
              "(logreg results are still written)")
        return None, None
    from sklearn.metrics import (balanced_accuracy_score, f1_score,
                                 roc_auc_score)
    from sklearn.multiclass import OneVsRestClassifier
    from sklearn.preprocessing import StandardScaler

    x_train = train_df[cell_metrics.marker_pred_cols].values
    y_train = train_df[cell_metrics.marker_cols].values
    x_test = test_df[cell_metrics.marker_pred_cols].values
    y_test = test_df[cell_metrics.marker_cols].values
    scaler = StandardScaler()
    xs = scaler.fit_transform(x_train)
    pos = max(int((y_train.ravel() == 1).sum()), 1)
    model = OneVsRestClassifier(XGBClassifier(
        eval_metric="logloss",
        scale_pos_weight=(y_train.ravel() == 0).sum() / pos,
        random_state=42))
    model.fit(xs, y_train)
    proba = model.predict_proba(scaler.transform(x_test))
    pred = model.predict(scaler.transform(x_test))
    results = []
    for idx, marker in enumerate(cell_metrics.marker_cols):
        results.append((marker,
                        roc_auc_score(y_test[:, idx], proba[:, idx]),
                        balanced_accuracy_score(y_test[:, idx], pred[:, idx]),
                        f1_score(y_test[:, idx], pred[:, idx])))
    return {"model": model, "scaler": scaler}, results_dataframe(results)
