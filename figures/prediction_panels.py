"""Qualitative prediction panels: H&E | GT | prediction per marker.

Script equivalent of the reference's figure4.ipynb / prediction_vis.png —
runs the generator from a checkpoint dir on sampled test tiles and writes
one panel PNG per tile with the H&E input, then a (GT, prediction) column
pair per marker, contrast-stretched the way the reference displays mIF.
"""

import argparse
import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

sys.path.insert(0, str(Path(__file__).parent.parent))

from mipheivit_tpu.config import load_yaml  # noqa: E402
from mipheivit_tpu.data.stats import (  # noqa: E402
    Normalizer,
    get_input_mean_std,
    load_channel_stats,
)
from mipheivit_tpu.infer.loading import load_generator  # noqa: E402
from mipheivit_tpu.infer.tiles import predictions_to_uint8  # noqa: E402
from mipheivit_tpu.slideio import TiffSlide, read_image  # noqa: E402


def _stretch(x: np.ndarray, pct: float = 99.5) -> np.ndarray:
    hi = max(float(np.percentile(x, pct)), 1.0)
    return np.clip(x.astype(np.float32) / hi, 0, 1)


def render_panel(he: np.ndarray, gt: np.ndarray, pred: np.ndarray,
                 names, out_path: str) -> None:
    """he [H,W,3] uint8; gt/pred [H,W,C] uint8."""
    n = len(names)
    fig, axes = plt.subplots(2, n + 1, figsize=(2.2 * (n + 1), 4.6))
    for row in range(2):
        axes[row, 0].imshow(he)
        axes[row, 0].set_ylabel(["ground truth", "prediction"][row])
    axes[0, 0].set_title("H&E")
    for c, name in enumerate(names):
        axes[0, c + 1].imshow(_stretch(gt[..., c]), cmap="magma",
                              vmin=0, vmax=1)
        axes[0, c + 1].set_title(name, fontsize=9)
        axes[1, c + 1].imshow(_stretch(pred[..., c]), cmap="magma",
                              vmin=0, vmax=1)
    for ax in axes.ravel():
        ax.set_xticks([])
        ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(out_path, dpi=200)
    plt.close(fig)


def main():
    import jax

    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_dir", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--n_tiles", type=int, default=4)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    cfg = load_yaml(str(Path(args.checkpoint_dir) / "config.yaml"))
    names = list(cfg.data.targ_channel_names)
    channel_stats = load_channel_stats(cfg.data.channel_stats_path)
    he_norm = Normalizer(get_input_mean_std(
        cfg.model.model_name, cfg.select("model.encoder.encoder_name"),
        channel_stats.rgb), mode="he")

    test_df = pd.read_csv(cfg.data.test_dataframe_path)
    sample = test_df.sample(min(args.n_tiles, len(test_df)),
                            random_state=args.seed)
    first = read_image(sample.iloc[0]["image_path"])
    model, variables = load_generator(cfg, args.checkpoint_dir,
                                      first.shape[0], len(names))
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for i, (_, row) in enumerate(sample.iterrows()):
        he = read_image(row["image_path"])
        x = np.asarray(he_norm(he), np.float32)[None]
        pred = predictions_to_uint8(np.asarray(fwd(variables, x))[0])
        ts = TiffSlide(row["target_path"])
        gt = ts.read_region((0, 0), 0, ts.dimensions)
        ts.close()
        render_panel(he, gt, pred, names, str(out / f"panel_{i}.png"))
    print(f"{len(sample)} panels -> {out}")


if __name__ == "__main__":
    main()
