"""Tile-dataframe builder with per-marker statistics columns.

Reference: scripts/create_dataframe*.py — given exported tile files and the
gated per-slide cell CSVs, compute the per-tile ``{m}_count`` (positive
cells in the tile) and ``{m}_prop`` (positive-pixel proportion) columns the
balanced sampler and foreground weights consume (src/dataset.py:492-494,
src/utils.py:202-206).
"""

import argparse
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent.parent))

from mipheivit_tpu.slideio import read_image  # noqa: E402


def tile_marker_stats(tile_df: pd.DataFrame, slide_df: pd.DataFrame,
                      channel_names, if_threshold: float = 1.0) -> pd.DataFrame:
    """Adds {m}_count / {m}_prop columns. Counts come from gated cell CSVs
    when nuclei tiles exist; props from thresholded mIF pixels."""
    out = tile_df.copy()
    cells = {}
    for _, row in slide_df.iterrows():
        if row.get("nuclei_csv_path"):
            cells[row["in_slide_name"]] = pd.read_csv(row["nuclei_csv_path"])

    counts = {f"{m}_count": [] for m in channel_names}
    props = {f"{m}_prop": [] for m in channel_names}
    for _, row in out.iterrows():
        mif = read_image(row["target_path"])
        for idx, m in enumerate(channel_names):
            props[f"{m}_prop"].append(
                float((mif[..., idx] > if_threshold).mean()))
        if "nuclei_path" in row.index and isinstance(row.get("nuclei_path"), str):
            nuc = read_image(row["nuclei_path"])[..., 0]
            labels = np.unique(nuc[nuc > 0])
            cell_df = cells.get(row.get("in_slide_name"))
            for m in channel_names:
                col = f"{m}_pos"
                if cell_df is not None and col in cell_df.columns:
                    pos = cell_df[cell_df["label"].isin(labels)][col].sum()
                else:
                    pos = 0
                counts[f"{m}_count"].append(int(pos))
        else:
            for m in channel_names:
                counts[f"{m}_count"].append(0)
    for key, vals in {**counts, **props}.items():
        out[key] = vals
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tile_dataframe", required=True)
    parser.add_argument("--slide_dataframe", required=True)
    parser.add_argument("--channel_names", required=True)
    parser.add_argument("--out_csv", required=True)
    args = parser.parse_args()

    out = tile_marker_stats(pd.read_csv(args.tile_dataframe),
                            pd.read_csv(args.slide_dataframe),
                            args.channel_names.split(","))
    out.to_csv(args.out_csv, index=False)
    print(f"{len(out)} rows -> {args.out_csv}")


if __name__ == "__main__":
    main()
