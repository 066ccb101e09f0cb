"""ROI inference demo: H&E region -> predicted mIF + on-the-fly cell typing.

Script equivalent of the reference's demo notebook
(notebooks/inference_orion_hemit.ipynb cells 2-8): read a region from an
H&E WSI (or a tile file), run the generator, segment nuclei on the fly
(classical backend when CellPose is absent), pool per-nucleus marker
means, gate cells with the checkpoint's logreg head, and write a side-car
CSV + the predicted mIF TIFF.
"""

import argparse
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent
                       / "preprocessings" / "nuclei_segmentation"))

from mipheivit_tpu.config import load_yaml
from mipheivit_tpu.data.stats import (
    Normalizer, get_input_mean_std, load_channel_stats)
from mipheivit_tpu.infer.loading import load_generator
from mipheivit_tpu.infer.tiles import predictions_to_uint8
from mipheivit_tpu.metrics.cell import CellMetrics
from mipheivit_tpu.slideio import SlideReader, read_image, write_pyramid


def main():
    import jax
    import jax.numpy as jnp

    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_dir", required=True)
    parser.add_argument("--input", required=True,
                        help="H&E WSI or tile image file")
    parser.add_argument("--xy", default=None, help="x,y for WSI region reads")
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--out_prefix", default="roi")
    args = parser.parse_args()

    cfg = load_yaml(str(Path(args.checkpoint_dir) / "config.yaml"))
    stats = load_channel_stats(cfg.data.channel_stats_path)
    names = list(cfg.data.targ_channel_names)

    if args.xy:
        x0, y0 = (int(v) for v in args.xy.split(","))
        reader = SlideReader(args.input, mode="RGB")
        tile = reader.read_region((x0, y0), 0, (args.size, args.size))
        reader.close()
    else:
        tile = read_image(args.input)[:args.size, :args.size]

    he_norm = Normalizer(get_input_mean_std(
        cfg.model.model_name, cfg.select("model.encoder.encoder_name"),
        stats.rgb), mode="he")
    dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
    model, variables = load_generator(
        cfg, args.checkpoint_dir, (args.size, args.size), len(names),
        dtype=dtype)
    pred = np.asarray(model.apply(
        variables, jnp.asarray(he_norm(tile))[None], train=False))[0]

    mif_u8 = predictions_to_uint8(pred)
    write_pyramid(f"{args.out_prefix}_mif.ome.tiff",
                  np.moveaxis(mif_u8, -1, 0), n_levels=2, tile_size=256)

    # on-the-fly nuclei from the predicted nuclear channel (or DAPI-like ch 0)
    from backends import get_backend

    nuc_channel = 0
    labels = get_backend("auto")(mif_u8[..., nuc_channel])
    print(f"{labels.max()} nuclei segmented")

    slide_df = pd.DataFrame({"in_slide_name": ["roi"],
                             "nuclei_csv_path": [None]})
    cm = CellMetrics(slide_df, names, min_area=20)
    cm.update(jnp.asarray(pred)[None], jnp.asarray(labels)[None], ["roi"])
    cells = cm.get_dataframe_cell_pred()

    logreg_npz = Path(args.checkpoint_dir) / "logreg.npz"
    if logreg_npz.exists():
        from mipheivit_tpu.metrics.cell import LogRegHead

        data = np.load(logreg_npz)
        head = LogRegHead(weight=data["weight"], bias=data["bias"])
        probs = head.predict_proba(cells[cm.marker_pred_cols].values)
        for i, col in enumerate(cm.marker_cols):
            cells[f"{col}_logreg"] = probs[:, i] > 0.5
    cells.to_csv(f"{args.out_prefix}_cells.csv", index=False)
    print(f"wrote {args.out_prefix}_mif.ome.tiff and "
          f"{args.out_prefix}_cells.csv ({len(cells)} cells)")


if __name__ == "__main__":
    main()
