"""ORION paper evaluation (reference: evaluation/eval_orion.py).

val+test tiles -> generator -> per-nucleus pooling -> cell dataframe split
by slide -> logistic regression (fit on val slides, scored on test slides)
+ optional XGBoost. Emits the checkpoint-folder artifact set that ships
with released checkpoints: ``results_logreg.csv``, ``results_xgboost.csv``,
``cell_dataframe.csv``, ``logreg.npz`` (weights also saved in the
reference's .pth layout when torch is available).
"""

import argparse
import sys
from pathlib import Path

import numpy as np
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
                          / "mipheivit_tpu/configs/data/orion.yaml")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_dir", type=str, required=True)
    parser.add_argument("--dataset_config_path", default=DATASET_CONFIG_PATH)
    parser.add_argument("--batch_size", type=int, default=4)
    args = parser.parse_args()

    cfg = load_eval_config(args.checkpoint_dir, args.dataset_config_path)
    slide_df = pd.read_csv(cfg.data.slide_dataframe_path)
    val_df = pd.read_csv(cfg.data.val_dataframe_path)
    test_df = pd.read_csv(cfg.data.test_dataframe_path)
    dataframe = pd.concat((val_df, test_df))
    # target := image (pooling runs on predictions only;
    # reference: eval_orion.py:147)
    dataframe["target_path"] = dataframe["image_path"]

    sample = read_image(dataframe["image_path"].iloc[0])
    width, height = get_effective_width_height(
        sample.shape[1], sample.shape[0], train=True)
    nc_out = len(cfg.data.targ_channel_names)
    fwd = build_forward(cfg, args.checkpoint_dir, width, height, nc_out)

    cell_metrics = run_cell_accumulation(
        cfg, fwd, dataframe, slide_df, crop=min(256, width),
        batch_size=args.batch_size)
    cell_dataframe = cell_metrics.get_dataframe_cell_pred_target()
    cell_metrics.reset()

    val_slides = list(val_df["in_slide_name"].unique())
    test_slides = list(test_df["in_slide_name"].unique())
    val_cells = cell_dataframe[cell_dataframe["slide_name"].isin(val_slides)]
    test_cells = cell_dataframe[cell_dataframe["slide_name"].isin(test_slides)]

    results, logreg = cell_metrics.train_logistic_regression(
        val_cells, test_cells, return_metrics=True)
    results_df = results_dataframe(results)

    out_dir = Path(args.checkpoint_dir)
    results_df.to_csv(out_dir / "results_logreg.csv", index=False)
    cell_dataframe.to_csv(out_dir / "cell_dataframe.csv", index=False)
    np.savez(out_dir / "logreg.npz", **logreg.state_dict())
    try:
        import torch

        torch.save({"weight": torch.tensor(logreg.weight),
                    "bias": torch.tensor(logreg.bias)},
                   str(out_dir / "logreg.pth"))
    except ImportError:
        pass

    xgb_dict, xgb_results = train_xgboost_or_none(val_cells, test_cells,
                                                  cell_metrics)
    if xgb_results is not None:
        import joblib

        xgb_results.to_csv(out_dir / "results_xgboost.csv", index=False)
        joblib.dump(xgb_dict, str(out_dir / "xgboost.pkl"))

    print(results_df.to_string(index=False))
    print(f"mean AUC: {results_df['ROC AUC'].mean():.4f}")


if __name__ == "__main__":
    main()
