"""Single-cell expression matrix from mIF + nuclei label WSIs.

Reference: preprocessings/single_cell_analysis/extract_expression_matrix.py
:50-131 — per channel (RAM-bounded), walk 8192-px tile pairs, accumulate
per-label pixel area / intensity sums / centroids, groupby-sum across tiles
-> per-slide CSV with ``label, area, centroid-0, centroid-1,
mean_intensity-{c}...`` columns (skimage.regionprops parity via bincount).
"""

import argparse
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

from mipheivit_tpu.slideio import SlideReader  # noqa: E402


def accumulate_tile(nuclei: np.ndarray, mif: np.ndarray, origin=(0, 0)):
    """Per-label sums for one tile: returns dict label -> (area, sums[C],
    centroid_sums[2])."""
    labs = nuclei.reshape(-1)
    valid = labs > 0
    labs = labs[valid]
    if labs.size == 0:
        return {}
    vals = mif.reshape(-1, mif.shape[-1])[valid].astype(np.float64)
    h, w = nuclei.shape
    yy, xx = np.divmod(np.flatnonzero(valid.reshape(-1)), w)
    uniq, inv = np.unique(labs, return_inverse=True)
    area = np.bincount(inv)
    sums = np.zeros((len(uniq), mif.shape[-1]))
    for c in range(mif.shape[-1]):
        sums[:, c] = np.bincount(inv, weights=vals[:, c])
    cy = np.bincount(inv, weights=yy + origin[1])
    cx = np.bincount(inv, weights=xx + origin[0])
    return {int(lab): (int(area[i]), sums[i], np.array([cy[i], cx[i]]))
            for i, lab in enumerate(uniq)}


def extract_expression_matrix(mif_path: str, nuclei_path: str,
                              tile_size: int = 8192) -> pd.DataFrame:
    mif = SlideReader(mif_path, mode="IF")
    nuc = SlideReader(nuclei_path, channel_idxs=[0], mode="IF")
    w, h = mif.dimensions
    n_ch = mif.n_channels
    acc = {}
    for ty in range(0, h, tile_size):
        for tx in range(0, w, tile_size):
            size = (min(tile_size, w - tx), min(tile_size, h - ty))
            labels = nuc.read_region((tx, ty), 0, size)[..., 0].astype(np.int64)
            values = mif.read_region((tx, ty), 0, size)
            for lab, (area, sums, cent) in accumulate_tile(
                    labels, values, origin=(tx, ty)).items():
                if lab in acc:
                    a0, s0, c0 = acc[lab]
                    acc[lab] = (a0 + area, s0 + sums, c0 + cent)
                else:
                    acc[lab] = (area, sums, cent)
    mif.close()
    nuc.close()

    rows = []
    for lab in sorted(acc):
        area, sums, cent = acc[lab]
        row = {"label": lab, "area": area,
               "centroid-0": cent[0] / area, "centroid-1": cent[1] / area}
        for c in range(n_ch):
            row[f"mean_intensity-{c}"] = sums[c] / area
        rows.append(row)
    return pd.DataFrame(rows)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--slide_dataframe", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--tile_size", type=int, default=8192)
    args = parser.parse_args()

    slide_df = pd.read_csv(args.slide_dataframe)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for _, row in slide_df.iterrows():
        df = extract_expression_matrix(
            row["targ_slide_path"], row["nuclei_slide_path"], args.tile_size)
        out = out_dir / f"{row['in_slide_name']}_cells.csv"
        df.to_csv(out, index=False)
        print(f"{row['in_slide_name']}: {len(df)} cells -> {out}")


if __name__ == "__main__":
    main()
