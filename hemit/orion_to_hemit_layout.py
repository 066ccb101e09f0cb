"""Convert an ORION-style tile dataframe into the HEMIT/pix2pix folder
layout (reference: hemit/ converters — <root>/<split>/{input,label}/ pairs)
so the reproduction trainer and the original HEMIT codebase can consume the
same data."""

import argparse
import shutil
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent.parent))

from mipheivit_tpu.slideio import read_image, write_pyramid  # noqa: E402


def convert(df: pd.DataFrame, split: str, out_root: Path,
            copy_targets: bool = True) -> int:
    in_dir = out_root / split / "input"
    lab_dir = out_root / split / "label"
    in_dir.mkdir(parents=True, exist_ok=True)
    lab_dir.mkdir(parents=True, exist_ok=True)
    n = 0
    for _, row in df.iterrows():
        src = Path(row["image_path"])
        shutil.copy2(src, in_dir / src.name)
        targ = Path(row["target_path"])
        if copy_targets and targ.suffix == src.suffix:
            shutil.copy2(targ, lab_dir / src.name)
        else:
            # re-encode the mIF tile under the input's stem
            arr = read_image(str(targ))
            write_pyramid(str(lab_dir / (src.stem + ".tiff")),
                          np.moveaxis(arr, -1, 0), n_levels=1,
                          tile_size=max(64, min(512, arr.shape[0])))
        n += 1
    return n


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--train_dataframe", required=True)
    parser.add_argument("--val_dataframe", required=True)
    parser.add_argument("--test_dataframe", required=True)
    parser.add_argument("--out_root", required=True)
    args = parser.parse_args()

    out = Path(args.out_root)
    for split, path in (("train", args.train_dataframe),
                        ("val", args.val_dataframe),
                        ("test", args.test_dataframe)):
        n = convert(pd.read_csv(path), split, out)
        print(f"{split}: {n} pairs -> {out / split}")


if __name__ == "__main__":
    main()
