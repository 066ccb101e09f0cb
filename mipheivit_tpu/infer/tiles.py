"""Batch tile inference: run_inference.py-compatible driver.

Reference: src/inference.py:87-186 + SavePredictionsCallback
(src/callbacks.py:330-351): load generator from a checkpoint dir, center-crop
tiles to the pow2 size, batched forward, write each prediction as a uint8
multi-channel TIFF named after the tile (``(pred + 0.9) / 1.8 * 255``).

TPU shape: a single jitted forward; batches stream through the threaded
loader with device prefetch; the final ragged batch is padded to the
compiled batch size (one compilation, no retrace).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import numpy as np
import pandas as pd

from ..data.augment import get_augmentations
from ..data.dataset import TileDataset, SlideDataset
from ..data.pipeline import Loader, device_prefetch
from ..data.stats import (
    Normalizer,
    get_effective_width_height,
    get_input_mean_std,
    load_channel_stats,
)
from ..slideio import write_pyramid
from .loading import load_generator

log = logging.getLogger(__name__)


def predictions_to_uint8(pred: np.ndarray) -> np.ndarray:
    """[-0.9, 0.9] -> uint8 (reference: src/callbacks.py:344-346)."""
    arr = np.clip((np.asarray(pred, np.float32) + 0.9) / 1.8, 0.0, 1.0)
    return (arr * 255.0).astype(np.uint8)


def save_prediction_tiff(pred_hwc: np.ndarray, out_path: str) -> None:
    """Per-tile multi-channel TIFF (pyvips write parity; planar pages)."""
    write_pyramid(out_path, np.moveaxis(pred_hwc, -1, 0), n_levels=1,
                  tile_size=min(512, max(64, pred_hwc.shape[0])))


def inference_model(cfg, checkpoint_dir: str, output_dir: str,
                    dtype: Optional[str] = None,
                    batch_size: Optional[int] = None) -> str:
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
    out_dir = Path(output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    test_df = pd.read_csv(cfg.data.test_dataframe_path)
    from_slide = "image_path" not in test_df.columns
    channel_stats = load_channel_stats(cfg.data.channel_stats_path)
    nc_out = len(cfg.data.targ_channel_names)

    if from_slide:
        width = int(test_df["tile_size_x"].iloc[0])
        height = int(test_df["tile_size_y"].iloc[0])
    else:
        from ..slideio import read_image

        sample = read_image(test_df["image_path"].iloc[0])
        height, width = sample.shape[:2]
    width, height = get_effective_width_height(width, height, train=True)
    log.info("inference at %dx%d, %d markers", width, height, nc_out)

    rgb_stats = get_input_mean_std(
        cfg.model.model_name, cfg.select("model.encoder.encoder_name"),
        channel_stats.rgb)
    he_norm = Normalizer(rgb_stats, mode="he")
    spatial, _ = get_augmentations(width, height, training=False)

    if from_slide:
        slide_df = pd.read_csv(cfg.data.slide_dataframe_path)
        # input-only slide reads (reference: SlideDataset, inference.py:119-120)
        dataset = SlideDataset(
            slide_df, test_df, preprocess_input_fn=he_norm,
            spatial_augmentations=spatial)
    else:
        dataset = TileDataset(test_df, preprocess_input_fn=he_norm,
                              spatial_augmentations=spatial)

    batch = int(batch_size or cfg.train.batch_size)
    model, variables = load_generator(
        cfg, checkpoint_dir, (height, width), nc_out, dtype=dtype,
        fast_heads=cfg.model.model_name.startswith("myvitmatte"))

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))

    loader = Loader(dataset, batch, shuffle=False, drop_last=False,
                    num_workers=4)
    n_done = 0
    for host_batch in device_prefetch(loader, size=2):
        x = host_batch["image"]
        n = x.shape[0]
        if n < batch:  # pad the last ragged batch to avoid a retrace
            pad = jnp.zeros((batch - n,) + x.shape[1:], x.dtype)
            x = jnp.concatenate([x, pad], axis=0)
        preds = np.asarray(fwd(variables, x))[:n]
        for pred, tile_name in zip(preds, host_batch["tile_name"]):
            save_prediction_tiff(predictions_to_uint8(pred),
                                 str(out_dir / f"{tile_name}.tiff"))
        n_done += n
    log.info("wrote %d prediction tiles to %s", n_done, out_dir)
    return str(out_dir)
