"""IMMUCAN external validation (reference: evaluation/eval_immucan.py).

Tile-level Pearson correlation between predicted-positive cell counts
(generator -> per-nucleus means -> logreg gating from the ORION
checkpoint's ``logreg`` weights) and the dataframe's ground-truth
``{marker}_count`` columns, for CD3e / CD8a / CD4 / FOXP3 / Pan-CK.
Emits ``immucan_corr.csv`` + ``immucan_tile_sums.csv``.
"""

import argparse
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent))

from common import (  # noqa: E402
    build_forward,
    load_eval_config,
    run_cell_accumulation,
)
from mipheivit_tpu.data.stats import get_effective_width_height  # noqa: E402
from mipheivit_tpu.metrics.cell import LogRegHead  # noqa: E402
from mipheivit_tpu.slideio import read_image  # noqa: E402

MARKERS = ("CD3e", "CD8a", "CD4", "FOXP3", "Pan-CK")
DATASET_CONFIG_PATH = str(Path(__file__).parent.parent
                          / "mipheivit_tpu/configs/data/immucan.yaml")


def load_logreg(checkpoint_dir: str) -> LogRegHead:
    npz = Path(checkpoint_dir) / "logreg.npz"
    if npz.exists():
        data = np.load(npz)
        return LogRegHead(weight=data["weight"], bias=data["bias"])
    pth = Path(checkpoint_dir) / "logreg.pth"
    if pth.exists():
        import torch

        state = torch.load(str(pth), map_location="cpu", weights_only=True)
        return LogRegHead(weight=state["weight"].numpy(),
                          bias=state["bias"].numpy())
    raise FileNotFoundError(
        f"no logreg.npz/logreg.pth in {checkpoint_dir}; run eval_orion first")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_dir", type=str, required=True)
    parser.add_argument("--dataset_config_path", default=DATASET_CONFIG_PATH)
    parser.add_argument("--batch_size", type=int, default=4)
    args = parser.parse_args()

    cfg = load_eval_config(args.checkpoint_dir, args.dataset_config_path)
    dataframe = pd.read_csv(cfg.data.test_dataframe_path)
    dataframe["target_path"] = dataframe["image_path"]
    # per-tile accumulation: the "slide" key is the tile name
    # (reference: eval_immucan.py:127-130)
    tile_names = dataframe["image_path"].apply(lambda x: Path(x).stem)
    slide_df = pd.DataFrame({"in_slide_name": tile_names.tolist(),
                             "nuclei_csv_path": None})

    sample = read_image(dataframe["image_path"].iloc[0])
    width, height = get_effective_width_height(
        sample.shape[1], sample.shape[0], train=True)
    nc_out = len(cfg.data.targ_channel_names)
    fwd = build_forward(cfg, args.checkpoint_dir, width, height, nc_out)
    logreg = load_logreg(args.checkpoint_dir)

    cell_metrics = run_cell_accumulation(
        cfg, fwd, dataframe, slide_df, crop=min(256, width),
        batch_size=args.batch_size, slide_key="tile_name")
    cell_dataframe = cell_metrics.get_dataframe_cell_pred()
    cell_dataframe = cell_dataframe.rename(columns={"slide_name": "tile_name"})
    cell_metrics.reset()

    probs = logreg.predict_proba(
        cell_dataframe[cell_metrics.marker_pred_cols].values.astype(np.float32))
    pred_columns = [f"{col}_logreg" for col in cell_metrics.marker_cols]
    cell_dataframe[pred_columns] = probs > 0.5

    tile_sums = cell_dataframe.groupby("tile_name")[pred_columns].sum() \
        .reset_index(drop=False)
    dataframe["tile_name"] = tile_names
    drop = [c for c in ("image_path", "nuclei_path", "target_path")
            if c in dataframe.columns]
    dataframe = dataframe.drop(columns=drop)
    dataframe = dataframe.rename(columns={"CD3_count": "CD3e_count",
                                          "CD8_count": "CD8a_count"})
    tile_sums = tile_sums.merge(dataframe, on="tile_name")

    from scipy.stats import pearsonr

    out_dir = Path(args.checkpoint_dir)
    rows = []
    for marker in MARKERS:
        truth_col = f"{marker}_count"
        pred_col = f"{marker}_pos_logreg"
        if truth_col not in tile_sums.columns or pred_col not in tile_sums.columns:
            continue
        corr, _ = pearsonr(tile_sums[truth_col], tile_sums[pred_col])
        rows.append([marker, corr])
        print(f"{marker}: Pearson r = {corr:.3f}")
    pd.DataFrame(rows, columns=["Marker", "Pearson"]).to_csv(
        out_dir / "immucan_corr.csv", index=False)
    tile_sums.to_csv(out_dir / "immucan_tile_sums.csv", index=False)


if __name__ == "__main__":
    main()
