"""HEMIT benchmark evaluation of HEMIT-codebase checkpoints.

Reference: evaluation/eval_hemit_hemit_pipeline.py — eval_hemit's 20x
inference + 5%-train-cell gating, with the dual-branch generator loaded
from a pix2pix checkpoint (see eval_orion_hemit_pipeline for the import).
"""

import argparse
import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).parent))

from common import (  # noqa: E402
    load_eval_config,
    results_dataframe,
    run_cell_accumulation,
    train_xgboost_or_none,
)
from eval_orion_hemit_pipeline import build_hemit_forward  # noqa: E402
from mipheivit_tpu.data.stats import get_effective_width_height  # noqa: E402
from mipheivit_tpu.slideio import read_image  # noqa: E402

DATASET_CONFIG_PATH = str(Path(__file__).parent.parent
                          / "mipheivit_tpu/configs/data/hemit.yaml")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_dir", type=str, required=True)
    parser.add_argument("--dataset_config_path", default=DATASET_CONFIG_PATH)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--netG", default="SwinTResnet",
                        help="HEMIT generator variant (reference "
                             "get_generator_hemit netG names)")
    parser.add_argument("--new_timm_layout", action="store_true")
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
    fwd = build_hemit_forward(args.checkpoint_dir, width // 2, nc_out,
                              old_timm_layout=not args.new_timm_layout,
                              netG=args.netG)

    cell_metrics = run_cell_accumulation(
        cfg, fwd, dataframe, slide_df, crop=width,
        batch_size=args.batch_size, scale_factor=0.5)
    cell_dataframe = cell_metrics.get_dataframe_cell_pred_target()
    cell_metrics.reset()

    train_slides = list(train_df["in_slide_name"].unique())
    train_pool = cell_dataframe[
        cell_dataframe["slide_name"].isin(train_slides)]
    # 5% train-cell sample (reference: eval_hemit.py:237-243); keep at least
    # a handful of cells so tiny datasets don't degenerate
    n_sample = max(int(len(train_pool) * 0.05), min(len(train_pool), 10))
    train_cells = train_pool.sample(n=n_sample, random_state=42)
    out_dir = Path(args.checkpoint_dir)
    for split, df in (("val", val_df), ("test", test_df)):
        slides = list(df["in_slide_name"].unique())
        cells = cell_dataframe[cell_dataframe["slide_name"].isin(slides)]
        results, _ = cell_metrics.train_logistic_regression(
            train_cells, cells, return_metrics=True)
        results_dataframe(results).to_csv(
            out_dir / f"hemit_results_logreg_{split}.csv", index=False)
        _, xgb = train_xgboost_or_none(train_cells, cells, cell_metrics)
        if xgb is not None:
            xgb.to_csv(out_dir / f"hemit_results_xgboost_{split}.csv",
                       index=False)
        print(split, results_dataframe(results).to_string(index=False))


if __name__ == "__main__":
    main()
