"""Re-point slide-dataframe paths at relocated IF / nuclei-CSV folders and
rename ``{marker}_pred`` tile-stat columns to ``{marker}_pos``.

Reference: scripts/update_dataframe2.py — rewrites targ_slide_path /
nuclei_csv_path basenames onto new directories, then applies the
``_pred`` -> ``_pos`` column rename to the train/val/test dataframes.
"""

import argparse
from pathlib import Path

import pandas as pd


def repoint(df: pd.DataFrame, if_dir: str, nuclei_csv_dir: str):
    df = df.copy()
    df["targ_slide_path"] = df["targ_slide_path"].apply(
        lambda x: str(Path(if_dir) / Path(x).name))
    df["nuclei_csv_path"] = df["nuclei_csv_path"].apply(
        lambda x: str(Path(nuclei_csv_dir) / Path(x).name))
    return df


def rename_pred_to_pos(df: pd.DataFrame) -> pd.DataFrame:
    rename = {c: c.replace("_pred", "_pos")
              for c in df.columns if "_pred" in c}
    return df.rename(columns=rename)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--slide_dataframe", required=True)
    parser.add_argument("--if_dir", required=True)
    parser.add_argument("--nuclei_csv_dir", required=True)
    parser.add_argument("--out_dir", default="data")
    args = parser.parse_args()

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    slide_df = repoint(pd.read_csv(args.slide_dataframe),
                       args.if_dir, args.nuclei_csv_dir)
    slide_df.to_csv(out / "slide_dataframe.csv", index=False)

    for split in ("train", "val", "test"):
        path = out / f"{split}_dataframe.csv"
        if not path.exists():
            print(f"skip {path} (missing)")
            continue
        rename_pred_to_pos(pd.read_csv(path)).to_csv(path, index=False)
        print(f"renamed _pred -> _pos in {path}")


if __name__ == "__main__":
    main()
