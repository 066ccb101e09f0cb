"""Rename pix2pix B-side tiles so each target shares its input's stem.

Reference: hemit/correct_names.py — after orion_to_hemit_layout, the
trainB/valB files keep the mIF tile names; the HEMIT codebase pairs A/B
by identical stems, so each ``<split>B/<target name>`` is renamed to
``<split>B/<image stem>.tiff``.
"""

import argparse
import os
from pathlib import Path

import pandas as pd


def correct_split(df: pd.DataFrame, b_dir: Path, dry_run: bool = False):
    n = 0
    for _, row in df.iterrows():
        src = b_dir / Path(row["target_path"]).name
        dst = b_dir / (Path(row["image_path"]).stem + ".tiff")
        if src == dst or not src.exists():
            continue
        if dst.exists():
            # two rows mapping onto one stem would silently destroy a
            # target tile — refuse instead of losing ground truth
            raise FileExistsError(
                f"refusing to rename {src} -> {dst}: destination exists "
                "(image-stem collision in the dataframe?)")
        if not dry_run:
            os.rename(src, dst)
        n += 1
    return n


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--train_dataframe", required=True)
    parser.add_argument("--val_dataframe", required=True)
    parser.add_argument("--dry_run", action="store_true")
    args = parser.parse_args()

    train_df = pd.read_csv(args.train_dataframe)
    parent = Path(train_df["image_path"].iloc[0]).parent.parent
    n = correct_split(train_df, parent / "trainB", args.dry_run)
    print(f"trainB: {n} renamed")
    val_df = pd.read_csv(args.val_dataframe)
    n = correct_split(val_df, parent / "valB", args.dry_run)
    print(f"valB: {n} renamed")


if __name__ == "__main__":
    main()
