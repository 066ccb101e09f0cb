"""Rebuild the ORION slide dataframe from the raw data folder and re-split
the tile dataframe by the paper's fixed slide lists.

Reference: scripts/update_dataframe.py — globs each slide directory for
``*registered.ome.tif`` (H&E) / ``*zlib.ome.tiff`` (mIF), writes
slide_dataframe.csv, then splits dataframe.csv into train/val/test by the
two hardcoded val and test slide name lists (:34-37).
"""

import argparse
from pathlib import Path

import pandas as pd

TEST_SLIDES = [
    "19510_C11_US_SCAN_OR_001__151039-registered.ome",
    "18459_LSP10364_US_SCAN_OR_001__092347-registered.ome",
]
VAL_SLIDES = [
    "19510_C19_US_SCAN_OR_001__153041-registered.ome",
    "19510_C30_US_SCAN_OR_001__155702-registered.ome",
]


def build_slide_dataframe(data_dir: str) -> pd.DataFrame:
    rows = []
    for slide_dir in sorted(Path(data_dir).glob("*")):
        he = sorted(slide_dir.glob("*registered.ome.tif"))
        mif = sorted(slide_dir.glob("*zlib.ome.tiff"))
        if not he or not mif:
            continue
        rows.append([he[0].stem, str(he[0]), str(mif[0])])
    return pd.DataFrame(
        rows, columns=["in_slide_name", "in_slide_path", "targ_slide_path"])


def split_dataframe(df: pd.DataFrame, val_slides, test_slides):
    held = list(val_slides) + list(test_slides)
    return (df[~df["in_slide_name"].isin(held)],
            df[df["in_slide_name"].isin(val_slides)],
            df[df["in_slide_name"].isin(test_slides)])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True,
                        help="ORION root: one directory per slide")
    parser.add_argument("--dataframe_csv", required=True,
                        help="full tile dataframe to split")
    parser.add_argument("--out_dir", default="data")
    parser.add_argument("--val_slides", nargs="*", default=VAL_SLIDES)
    parser.add_argument("--test_slides", nargs="*", default=TEST_SLIDES)
    args = parser.parse_args()

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    slide_df = build_slide_dataframe(args.data_dir)
    print(len(slide_df), "slides")
    slide_df.to_csv(out / "slide_dataframe.csv", index=False)

    df = pd.read_csv(args.dataframe_csv)
    train, val, test = split_dataframe(df, args.val_slides, args.test_slides)
    print(len(train), len(val), len(test))
    train.to_csv(out / "train_dataframe.csv", index=False)
    val.to_csv(out / "val_dataframe.csv", index=False)
    test.to_csv(out / "test_dataframe.csv", index=False)


if __name__ == "__main__":
    main()
