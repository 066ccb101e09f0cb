"""HEMIT benchmark evaluation (reference: evaluation/eval_hemit.py).

Differences from eval_orion: inference runs at 20x — tiles are bilinearly
downsampled 2x before the generator and predictions upsampled back
(reference lines 157-166, 216-219) — and the logreg/XGBoost gating is fit
on a 5% sample of *train*-slide cells (line 237-243), scored on val and
test separately. Emits ``hemit_results_{logreg,xgboost}_{val,test}.csv``.
"""

import argparse
import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).parent))

from common import (  # noqa: E402
    build_forward,
    load_eval_config,
    results_dataframe,
    run_cell_accumulation,
    train_xgboost_or_none,
)
from mipheivit_tpu.data.stats import get_effective_width_height  # noqa: E402
from mipheivit_tpu.slideio import read_image  # noqa: E402

DATASET_CONFIG_PATH = str(Path(__file__).parent.parent
                          / "mipheivit_tpu/configs/data/hemit.yaml")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_dir", type=str, required=True)
    parser.add_argument("--dataset_config_path", default=DATASET_CONFIG_PATH)
    parser.add_argument("--batch_size", type=int, default=4)
    args = parser.parse_args()

    cfg = load_eval_config(args.checkpoint_dir, args.dataset_config_path)
    slide_df = pd.read_csv(cfg.data.slide_dataframe_path)
    train_df = pd.read_csv(cfg.data.train_dataframe_path)
    val_df = pd.read_csv(cfg.data.val_dataframe_path)
    test_df = pd.read_csv(cfg.data.test_dataframe_path)
    dataframe = pd.concat((train_df, val_df, test_df))
    dataframe["target_path"] = dataframe["image_path"]

    sample = read_image(dataframe["image_path"].iloc[0])
    width, height = get_effective_width_height(
        sample.shape[1], sample.shape[0], train=True)
    nc_out = len(cfg.data.targ_channel_names)
    # model runs at half resolution (20x)
    fwd = build_forward(cfg, args.checkpoint_dir, width // 2, height // 2,
                        nc_out)

    cell_metrics = run_cell_accumulation(
        cfg, fwd, dataframe, slide_df, crop=width,
        batch_size=args.batch_size, scale_factor=0.5)
    cell_dataframe = cell_metrics.get_dataframe_cell_pred_target()
    cell_metrics.reset()

    train_slides = list(train_df["in_slide_name"].unique())
    val_slides = list(val_df["in_slide_name"].unique())
    test_slides = list(test_df["in_slide_name"].unique())
    train_pool = cell_dataframe[
        cell_dataframe["slide_name"].isin(train_slides)]
    # 5% train-cell sample (reference: eval_hemit.py:237-243); keep at least
    # a handful of cells so tiny datasets don't degenerate
    n_sample = max(int(len(train_pool) * 0.05), min(len(train_pool), 10))
    train_cells = train_pool.sample(n=n_sample, random_state=42)
    out_dir = Path(args.checkpoint_dir)

    for split, slides in (("val", val_slides), ("test", test_slides)):
        split_cells = cell_dataframe[cell_dataframe["slide_name"].isin(slides)]
        results, logreg = cell_metrics.train_logistic_regression(
            train_cells, split_cells, return_metrics=True)
        results_dataframe(results).to_csv(
            out_dir / f"hemit_results_logreg_{split}.csv", index=False)
        _, xgb_results = train_xgboost_or_none(train_cells, split_cells,
                                               cell_metrics)
        if xgb_results is not None:
            xgb_results.to_csv(
                out_dir / f"hemit_results_xgboost_{split}.csv", index=False)
        print(split, results_dataframe(results).to_string(index=False))

    cell_dataframe.to_csv(out_dir / "hemit_cell_dataframe.csv", index=False)


if __name__ == "__main__":
    main()
