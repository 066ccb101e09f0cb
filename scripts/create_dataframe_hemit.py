"""HEMIT folder layout -> tile dataframes (reference:
scripts/create_dataframe_hemit.py): <root>/<split>/{input,label}/*.png
pairs become image_path/target_path rows, one CSV per split, plus a
synthetic slide dataframe (HEMIT tiles carry a slide id prefix)."""

import argparse
from pathlib import Path

import pandas as pd


def build(root: str, split: str) -> pd.DataFrame:
    base = Path(root) / split
    rows = []
    for img in sorted((base / "input").glob("*")):
        label = base / "label" / img.name
        if not label.exists():
            continue
        slide = img.stem.split("_")[0]
        rows.append({"image_path": str(img), "target_path": str(label),
                     "in_slide_name": slide})
    return pd.DataFrame(rows)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", required=True)
    parser.add_argument("--out_dir", required=True)
    args = parser.parse_args()

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    slides = set()
    for split in ("train", "val", "test"):
        df = build(args.data_root, split)
        if len(df) == 0:
            continue
        df.to_csv(out / f"{split}_dataframe_hemit.csv", index=False)
        slides.update(df["in_slide_name"].unique())
        print(f"{split}: {len(df)} pairs")
    pd.DataFrame({"in_slide_name": sorted(slides),
                  "nuclei_csv_path": None}).to_csv(
        out / "slide_dataframe_hemit.csv", index=False)


if __name__ == "__main__":
    main()
