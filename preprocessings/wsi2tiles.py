"""Export tiles from registered WSIs to per-tile files.

Reference: preprocessings/wsi2tiles.py:81-151 — H&E tiles -> 8-bit image
files, mIF -> multi-channel TIFF, nuclei labels -> TIFF (nearest), optional
mpp rescale; emits the file-mode tile dataframe (image_path, target_path,
nuclei_path) consumed by TileImg2ImgDataset.
"""

import argparse
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import cv2
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent.parent))

from mipheivit_tpu.slideio import SlideReader, write_pyramid  # noqa: E402


def export_tiles(slide_row, tile_df: pd.DataFrame, out_dir: Path,
                 he_format: str = "png", rescale_mpp: float = 0.0,
                 num_workers: int = 4) -> pd.DataFrame:
    name = slide_row["in_slide_name"]
    he = SlideReader(slide_row["in_slide_path"], mode="RGB")
    mif = SlideReader(slide_row["targ_slide_path"], mode="IF")
    nuc = None
    if slide_row.get("nuclei_slide_path"):
        nuc = SlideReader(slide_row["nuclei_slide_path"], channel_idxs=[0],
                          mode="IF")
    (out_dir / "he").mkdir(parents=True, exist_ok=True)
    (out_dir / "mif").mkdir(exist_ok=True)
    if nuc is not None:
        (out_dir / "nuclei").mkdir(exist_ok=True)

    scale = 1.0
    if rescale_mpp and he.mpp:
        scale = he.mpp / rescale_mpp

    def one(row):
        loc = (int(row["x"]), int(row["y"]))
        size = (int(row["tile_size_x"]), int(row["tile_size_y"]))
        level = int(row["level"])
        tile_name = "_".join(map(str, [name, *loc, level, *size]))
        he_tile = he.read_region(loc, level, size)
        mif_tile = mif.read_region(loc, level, size)
        if scale != 1.0:
            new = (int(size[0] * scale), int(size[1] * scale))
            he_tile = cv2.resize(he_tile, new, interpolation=cv2.INTER_AREA)
            mif_tile = cv2.resize(mif_tile, new, interpolation=cv2.INTER_AREA)
        he_path = out_dir / "he" / f"{tile_name}.{he_format}"
        cv2.imwrite(str(he_path), cv2.cvtColor(he_tile, cv2.COLOR_RGB2BGR))
        mif_path = out_dir / "mif" / f"{tile_name}.tiff"
        write_pyramid(str(mif_path), np.moveaxis(mif_tile, -1, 0),
                      n_levels=1, tile_size=min(512, size[0]))
        rec = {"image_path": str(he_path), "target_path": str(mif_path),
               "in_slide_name": name}
        if nuc is not None:
            nuc_tile = nuc.read_region(loc, level, size)[..., 0]
            if scale != 1.0:
                nuc_tile = cv2.resize(nuc_tile, new,
                                      interpolation=cv2.INTER_NEAREST)
            nuc_path = out_dir / "nuclei" / f"{tile_name}.tiff"
            write_pyramid(str(nuc_path), np.int32(nuc_tile)[None],
                          n_levels=1, tile_size=min(512, size[0]))
            rec["nuclei_path"] = str(nuc_path)
        return rec

    rows = tile_df[tile_df["in_slide_name"] == name]
    with ThreadPoolExecutor(num_workers) as pool:
        records = list(pool.map(one, [r for _, r in rows.iterrows()]))
    he.close()
    mif.close()
    return pd.DataFrame(records)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--slide_dataframe", required=True)
    parser.add_argument("--tile_dataframe", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--out_csv", required=True)
    parser.add_argument("--he_format", default="png", choices=["png", "jpg"])
    parser.add_argument("--rescale_mpp", type=float, default=0.0)
    args = parser.parse_args()

    slide_df = pd.read_csv(args.slide_dataframe)
    tile_df = pd.read_csv(args.tile_dataframe)
    frames = [export_tiles(row, tile_df, Path(args.out_dir), args.he_format,
                           args.rescale_mpp)
              for _, row in slide_df.iterrows()]
    pd.concat(frames, ignore_index=True).to_csv(args.out_csv, index=False)
    print(f"exported tiles -> {args.out_csv}")


if __name__ == "__main__":
    main()
