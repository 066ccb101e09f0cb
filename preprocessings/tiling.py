"""Tile-dataframe builder: Otsu tissue tiling over WSIs.

Reference: preprocessings/tiling.py — for each slide in the slide
dataframe, compute the tissue mask on a thumbnail, grid level-0 tile
positions, and emit the tile dataframe rows
(in_slide_name, x, y, level, tile_size_x, tile_size_y, tissue_pct).
"""

import argparse
import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).parent.parent))

from mipheivit_tpu.slideio import SlideReader, get_locs_otsu  # noqa: E402


def tile_slide(slide_path: str, tile_size: int, overlap: int = 0,
               mask_thresh: float = 0.05, level: int = 0,
               slide_name: str = None) -> pd.DataFrame:
    reader = SlideReader(slide_path, mode="RGB")
    thumb = reader.get_thumbnail((2048, 2048))
    ds = reader.level_downsample(level)
    locs, pcts = get_locs_otsu(
        thumb, reader.dimensions, tile_size * ds, tile_overlap=overlap * ds,
        mask_thresh=mask_thresh)
    reader.close()
    name = slide_name or Path(slide_path).stem
    return pd.DataFrame({
        "in_slide_name": name,
        "x": locs[:, 0], "y": locs[:, 1], "level": level,
        "tile_size_x": tile_size, "tile_size_y": tile_size,
        "tissue_pct": pcts,
    })


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--slide_dataframe", required=True)
    parser.add_argument("--out_csv", required=True)
    parser.add_argument("--tile_size", type=int, default=256)
    parser.add_argument("--overlap", type=int, default=0)
    parser.add_argument("--mask_thresh", type=float, default=0.05)
    args = parser.parse_args()

    slide_df = pd.read_csv(args.slide_dataframe)
    frames = [tile_slide(row["in_slide_path"], args.tile_size, args.overlap,
                         args.mask_thresh,
                         slide_name=row.get("in_slide_name"))
              for _, row in slide_df.iterrows()]
    out = pd.concat(frames, ignore_index=True)
    out.to_csv(args.out_csv, index=False)
    print(f"{len(out)} tiles -> {args.out_csv}")


if __name__ == "__main__":
    main()
