"""Paper-style cell-level marker figures from a finished test run.

Script equivalent of the reference figure notebooks
(figures/orion_figures.ipynb, figures/hemit_figures.ipynb): consumes the
``test_dataframe_cell.csv`` the test driver writes beside the checkpoint
({marker}_pred mean intensities merged with GMM-gated {marker}_pos ground
truth) and emits

  * ``{out}/marker_metrics.csv``  — per-marker ROC AUC / balanced acc / F1
  * ``{out}/marker_auc.png``      — per-marker AUC bar chart
  * ``{out}/marker_violins.png``  — predicted intensity by GT pos/neg
  * ``{out}/marker_correlation.png`` — predicted-intensity Spearman
    cross-correlation heatmap (marker co-expression structure)
"""

import argparse
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from sklearn.metrics import balanced_accuracy_score, f1_score, roc_auc_score


def marker_names(cell_df: pd.DataFrame):
    return [c[:-5] for c in cell_df.columns if c.endswith("_pred")
            and f"{c[:-5]}_pos" in cell_df.columns]


def per_marker_metrics(cell_df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for m in marker_names(cell_df):
        y = cell_df[f"{m}_pos"].astype(bool).values
        p = cell_df[f"{m}_pred"].astype(float).values
        if y.all() or not y.any():
            continue
        thresh = np.median(p)
        rows.append({
            "marker": m,
            "roc_auc": roc_auc_score(y, p),
            "balanced_acc": balanced_accuracy_score(y, p > thresh),
            "f1": f1_score(y, p > thresh),
            "n_pos": int(y.sum()), "n_cells": len(y),
        })
    return pd.DataFrame(rows)


def make_figures(cell_csv: str, out_dir: str) -> None:
    import seaborn as sns

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    cell_df = pd.read_csv(cell_csv)
    markers = marker_names(cell_df)
    if not markers:
        raise ValueError(f"no *_pred/*_pos column pairs in {cell_csv}")

    metrics = per_marker_metrics(cell_df)
    metrics.to_csv(out / "marker_metrics.csv", index=False)

    fig, ax = plt.subplots(figsize=(max(4, 0.5 * len(metrics)), 3.2))
    ax.bar(metrics["marker"], metrics["roc_auc"], color="#4878d0")
    ax.axhline(0.5, color="gray", ls="--", lw=0.8)
    ax.set_ylabel("cell-level ROC AUC")
    ax.set_ylim(0, 1)
    plt.setp(ax.get_xticklabels(), rotation=60, ha="right")
    fig.tight_layout()
    fig.savefig(out / "marker_auc.png", dpi=200)
    plt.close(fig)

    long = []
    for m in markers:
        long.append(pd.DataFrame({
            "marker": m,
            "pred": cell_df[f"{m}_pred"].astype(float),
            "GT": np.where(cell_df[f"{m}_pos"].astype(bool), "pos", "neg")}))
    long = pd.concat(long)
    fig, ax = plt.subplots(figsize=(max(5, 0.8 * len(markers)), 3.5))
    sns.violinplot(long, x="marker", y="pred", hue="GT", split=True,
                   cut=0, inner="quart", ax=ax)
    plt.setp(ax.get_xticklabels(), rotation=60, ha="right")
    fig.tight_layout()
    fig.savefig(out / "marker_violins.png", dpi=200)
    plt.close(fig)

    corr = cell_df[[f"{m}_pred" for m in markers]].corr(method="spearman")
    corr.index = corr.columns = markers
    fig, ax = plt.subplots(figsize=(0.6 * len(markers) + 2,) * 2)
    sns.heatmap(corr, vmin=-1, vmax=1, cmap="vlag", square=True,
                annot=len(markers) <= 12, fmt=".2f", ax=ax)
    fig.tight_layout()
    fig.savefig(out / "marker_correlation.png", dpi=200)
    plt.close(fig)
    print(f"figures -> {out} ({len(markers)} markers, "
          f"{len(cell_df)} cells)")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cell_csv", required=True,
                        help="test_dataframe_cell.csv from run_test.py")
    parser.add_argument("--out_dir", required=True)
    args = parser.parse_args()
    make_figures(args.cell_csv, args.out_dir)


if __name__ == "__main__":
    main()
