"""Sample per-slide fractions of the train/val dataframes and split the
train sample into k folds (reference: scripts/create_folds.py — same
artifact names: train_dataframe_fold_{i}.csv, val_dataframe_fold.csv)."""

import argparse
from pathlib import Path

import numpy as np
import pandas as pd


def extract_folds(dataframe: pd.DataFrame, k: int, rng=None):
    """Shuffle-split into k roughly equal parts, each sorted back to the
    original row order (reference extract_folds)."""
    rng = rng or np.random.default_rng()
    arr = rng.permutation(len(dataframe))
    part_size, remainder = divmod(len(dataframe), k)
    sizes = [part_size + (1 if i < remainder else 0) for i in range(k)]
    parts, start = [], 0
    for size in sizes:
        parts.append(arr[start:start + size])
        start += size
    return [dataframe.iloc[part].sort_index() for part in parts]


def sample_per_slide(dataframe: pd.DataFrame, frac: float,
                     seed=None) -> pd.DataFrame:
    return pd.concat([df.sample(frac=frac, random_state=seed)
                      for _, df in dataframe.groupby("in_slide_name")])


def main():
    parser = argparse.ArgumentParser(
        description="Sample dataframes to create folds")
    parser.add_argument("--root_folder", required=True,
                        help="folder containing train/val dataframes")
    parser.add_argument("--sample_percent", type=float, default=0.3)
    parser.add_argument("--n_folds", type=int, default=3)
    parser.add_argument("--seed", type=int, default=None)
    args = parser.parse_args()

    root = Path(args.root_folder)
    train_df = pd.read_csv(root / "train_dataframe.csv")
    val_df = pd.read_csv(root / "val_dataframe.csv")

    rng = np.random.default_rng(args.seed)
    train_sample = sample_per_slide(train_df, args.sample_percent, args.seed)
    folds = extract_folds(train_sample, args.n_folds, rng)
    val_sample = sample_per_slide(val_df, args.sample_percent, args.seed)

    for i, fold in enumerate(folds):
        fold.to_csv(root / f"train_dataframe_fold_{i}.csv", index=False)
    val_sample.to_csv(root / "val_dataframe_fold.csv", index=False)
    print(f"{args.n_folds} folds of ~{len(folds[0])} tiles + "
          f"val sample of {len(val_sample)} -> {root}")


if __name__ == "__main__":
    main()
