"""Dataset visualization: H&E | per-marker mIF | nuclei contact sheets.

Script form of the reference's dataset_visualization.ipynb: sample tiles
from a tile dataframe and write PNG grids for eyeballing registration,
normalization, and marker signal.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from mipheivit_tpu.slideio import read_image
from mipheivit_tpu.utils import save_image_grid


def main():
    import pandas as pd

    parser = argparse.ArgumentParser()
    parser.add_argument("--tile_dataframe", required=True)
    parser.add_argument("--out_png", required=True)
    parser.add_argument("--n_tiles", type=int, default=4)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    df = pd.read_csv(args.tile_dataframe)
    rng = np.random.default_rng(args.seed)
    rows = df.iloc[rng.choice(len(df), size=min(args.n_tiles, len(df)),
                              replace=False)]
    hes, mifs = [], []
    for _, row in rows.iterrows():
        hes.append(read_image(row["image_path"]))
        mif = read_image(row["target_path"]).astype(np.float32)
        mifs.append(mif / 255.0 * 1.8 - 0.9)    # to the (-0.9,0.9) codec
    save_image_grid(args.out_png, np.stack(hes), np.stack(mifs),
                    max_images=args.n_tiles)
    print(f"grid -> {args.out_png}")


if __name__ == "__main__":
    main()
