"""IMMUCAN external validation of HEMIT-codebase checkpoints.

Reference: evaluation/eval_immucan_hemit_pipeline.py:1-195 — eval_immucan's
tile-level Pearson analysis (predicted-positive cell counts vs ground-truth
``{marker}_count`` columns for CD3e / CD8a / CD4 / FOXP3 / Pan-CK), with
the generator being a dual-branch ResnetGeneratorSwinT loaded from a
pix2pix-style checkpoint (``latest_net_G.pth``, timm-Swin key surgery —
see eval_orion_hemit_pipeline.build_hemit_forward) instead of a MIPHEI-ViT
safetensors export. Inputs use the pix2pix 127.5 normalization (reference
:125-126); the logreg gate comes from the checkpoint folder's ``logreg``
weights (reference :141-144). Emits ``immucan_corr.csv`` +
``immucan_tile_sums.csv`` beside the checkpoint.
"""

import argparse
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent))

from common import load_eval_config, run_cell_accumulation  # noqa: E402
from eval_immucan import MARKERS, load_logreg  # noqa: E402
from eval_orion_hemit_pipeline import build_hemit_forward  # noqa: E402
from mipheivit_tpu.data.stats import (  # noqa: E402
    Normalizer,
    get_effective_width_height,
)
from mipheivit_tpu.slideio import read_image  # noqa: E402

DATASET_CONFIG_PATH = str(Path(__file__).parent.parent
                          / "mipheivit_tpu/configs/data/immucan.yaml")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_dir", type=str, required=True)
    parser.add_argument("--dataset_config_path", default=DATASET_CONFIG_PATH)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--netG", default="SwinTResnet",
                        help="HEMIT generator variant (reference "
                             "get_generator_hemit netG names)")
    parser.add_argument("--new_timm_layout", action="store_true",
                        help="skip the old-timm downsample key shift")
    args = parser.parse_args()

    cfg = load_eval_config(args.checkpoint_dir, args.dataset_config_path)
    dataframe = pd.read_csv(cfg.data.test_dataframe_path)
    dataframe["target_path"] = dataframe["image_path"]
    # per-tile accumulation: the "slide" key is the tile name
    # (reference: eval_immucan_hemit_pipeline.py:111-114)
    tile_names = dataframe["image_path"].apply(lambda x: Path(x).stem)
    slide_df = pd.DataFrame({"in_slide_name": tile_names.tolist(),
                             "nuclei_csv_path": None})

    sample = read_image(dataframe["image_path"].iloc[0])
    width, height = get_effective_width_height(
        sample.shape[1], sample.shape[0], train=True)
    nc_out = len(cfg.data.targ_channel_names)
    fwd = build_hemit_forward(args.checkpoint_dir, width, nc_out,
                              old_timm_layout=not args.new_timm_layout,
                              netG=args.netG)
    logreg = load_logreg(args.checkpoint_dir)

    # pix2pix input normalization, not the config's encoder constants
    # (reference: eval_immucan_hemit_pipeline.py:125-126)
    he_norm = Normalizer({"mean": [127.5] * 3, "std": [127.5] * 3},
                         mode="he")
    cell_metrics = run_cell_accumulation(
        cfg, fwd, dataframe, slide_df, crop=min(256, width),
        batch_size=args.batch_size, slide_key="tile_name", he_norm=he_norm)
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
        if truth_col not in tile_sums.columns \
                or pred_col not in tile_sums.columns:
            continue
        corr, _ = pearsonr(tile_sums[truth_col], tile_sums[pred_col])
        rows.append([marker, corr])
        print(f"{marker}: Pearson r = {corr:.3f}")
    pd.DataFrame(rows, columns=["Marker", "Pearson"]).to_csv(
        out_dir / "immucan_corr.csv", index=False)
    tile_sums.to_csv(out_dir / "immucan_tile_sums.csv", index=False)


if __name__ == "__main__":
    main()
