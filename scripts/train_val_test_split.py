"""Split the tile dataframe by slide (reference:
scripts/train_val_test_split_orion.py — fixed slide lists; here list-file or
fraction-based, plus k-fold emission like scripts/create_kfolds.py)."""

import argparse
from pathlib import Path

import numpy as np
import pandas as pd


def split_by_slides(df: pd.DataFrame, val_slides, test_slides):
    val = df[df["in_slide_name"].isin(val_slides)]
    test = df[df["in_slide_name"].isin(test_slides)]
    train = df[~df["in_slide_name"].isin(set(val_slides) | set(test_slides))]
    return train, val, test


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tile_dataframe", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--val_slides", default="",
                        help="comma-separated slide names")
    parser.add_argument("--test_slides", default="")
    parser.add_argument("--val_frac", type=float, default=0.1)
    parser.add_argument("--test_frac", type=float, default=0.1)
    parser.add_argument("--kfolds", type=int, default=0)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    df = pd.read_csv(args.tile_dataframe)
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    slides = sorted(df["in_slide_name"].unique())
    rng = np.random.default_rng(args.seed)

    if args.kfolds:
        order = rng.permutation(slides)
        folds = np.array_split(order, args.kfolds)
        for k, fold in enumerate(folds):
            train = df[~df["in_slide_name"].isin(fold)]
            test = df[df["in_slide_name"].isin(fold)]
            train.to_csv(out / f"fold{k}_train.csv", index=False)
            test.to_csv(out / f"fold{k}_test.csv", index=False)
        print(f"{args.kfolds} folds -> {out}")
        return

    if args.val_slides or args.test_slides:
        val_slides = [s for s in args.val_slides.split(",") if s]
        test_slides = [s for s in args.test_slides.split(",") if s]
    else:
        order = rng.permutation(slides)
        n_val = max(1, int(len(slides) * args.val_frac))
        n_test = max(1, int(len(slides) * args.test_frac))
        val_slides = list(order[:n_val])
        test_slides = list(order[n_val:n_val + n_test])
    train, val, test = split_by_slides(df, val_slides, test_slides)
    train.to_csv(out / "train_dataframe.csv", index=False)
    val.to_csv(out / "val_dataframe.csv", index=False)
    test.to_csv(out / "test_dataframe.csv", index=False)
    print(f"train {len(train)} / val {len(val)} / test {len(test)} -> {out}")


if __name__ == "__main__":
    main()
