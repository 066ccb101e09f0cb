"""GMM gating: per-marker positive/negative calls on the expression matrix.

Reference: preprocessings/single_cell_analysis/gmm_gating.ipynb — a
2-component Gaussian mixture on log1p mean intensities per marker; cells in
the higher-mean component are positive. Produces the boolean ``{m}_pos``
truth columns the CellMetrics merge consumes (src/metrics.py:157-186).
"""

import argparse

import numpy as np
import pandas as pd


def gmm_gate(values: np.ndarray, random_state: int = 42) -> np.ndarray:
    from sklearn.mixture import GaussianMixture

    x = np.log1p(np.asarray(values, np.float64)).reshape(-1, 1)
    gm = GaussianMixture(n_components=2, random_state=random_state,
                         n_init=3).fit(x)
    pos_comp = int(np.argmax(gm.means_.ravel()))
    return gm.predict(x) == pos_comp


def gate_dataframe(df: pd.DataFrame, marker_names) -> pd.DataFrame:
    out = df.copy()
    for idx, name in enumerate(marker_names):
        col = f"mean_intensity-{idx}"
        out[f"{name}_pos"] = gmm_gate(out[col].to_numpy())
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cells_csv", required=True)
    parser.add_argument("--channel_names", required=True,
                        help="comma-separated marker names in channel order")
    parser.add_argument("--out_csv", required=True)
    args = parser.parse_args()

    df = pd.read_csv(args.cells_csv)
    gated = gate_dataframe(df, args.channel_names.split(","))
    gated.to_csv(args.out_csv, index=False)
    print(f"gated {len(gated)} cells -> {args.out_csv}")


if __name__ == "__main__":
    main()
