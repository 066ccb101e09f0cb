"""Per-tile mIF artifact-channel statistics.

Reference: preprocessings/artifacts_detection/orion_extract_if_artifact_props.py
— per tile, the proportion of saturated/positive pixels in designated
artifact channels (e.g. autofluorescence), joined onto the tile dataframe so
the filtering notebook can drop artifact tiles.
"""

import argparse
import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

from mipheivit_tpu.slideio import read_image  # noqa: E402


def artifact_props(dataframe: pd.DataFrame, artifact_channels,
                   thresh: float = 200.0) -> pd.DataFrame:
    out = dataframe.copy()
    cols = {c: [] for c in artifact_channels}
    for _, row in out.iterrows():
        mif = read_image(row["target_path"])
        for c in artifact_channels:
            cols[c].append(float((mif[..., int(c)] > thresh).mean()))
    for c, vals in cols.items():
        out[f"artifact_prop_ch{c}"] = vals
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tile_dataframe", required=True)
    parser.add_argument("--artifact_channels", required=True,
                        help="comma-separated channel indices")
    parser.add_argument("--thresh", type=float, default=200.0)
    parser.add_argument("--out_csv", required=True)
    args = parser.parse_args()

    df = pd.read_csv(args.tile_dataframe)
    chans = [int(c) for c in args.artifact_channels.split(",")]
    artifact_props(df, chans, args.thresh).to_csv(args.out_csv, index=False)
    print(f"artifact props -> {args.out_csv}")


if __name__ == "__main__":
    main()
