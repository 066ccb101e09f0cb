"""Headless AF-subtraction parameter sweep (napari-tool replacement).

Reference: preprocessings/mif_cleaning/napari_af_subtraction_tool.py is an
interactive GUI for hand-tuning the per-channel lambda/bias of
``ch - lambda*AF + bias``. Napari is unavailable here, so this CLI sweeps
lambda candidates on sampled tissue tiles and reports, per channel, the
lambda minimizing the residual correlation between the cleaned channel and
the AF channel (the quantity the GUI user is visually minimizing), writing
a lambda-settings JSON in the reference's contract.
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

from mipheivit_tpu.slideio import SlideReader, get_locs_otsu  # noqa: E402


def residual_af_correlation(tiles, channel: int, af_channel: int,
                            lam: float) -> float:
    cors = []
    for tile in tiles:
        ch = tile[..., channel].astype(np.float64).ravel()
        af = tile[..., af_channel].astype(np.float64).ravel()
        clean = np.maximum(ch - lam * af, 0)
        if clean.std() < 1e-9 or af.std() < 1e-9:
            continue
        cors.append(abs(np.corrcoef(clean, af)[0, 1]))
    return float(np.mean(cors)) if cors else 1.0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--slide_path", required=True)
    parser.add_argument("--af_channel", type=int, default=0)
    parser.add_argument("--out_json", required=True)
    parser.add_argument("--n_tiles", type=int, default=16)
    parser.add_argument("--tile_size", type=int, default=1024)
    parser.add_argument("--lambdas", default="0,0.1,0.25,0.5,0.75,1.0")
    args = parser.parse_args()

    reader = SlideReader(args.slide_path, mode="IF")
    thumb = reader.get_thumbnail((1024, 1024))
    locs, pcts = get_locs_otsu(thumb, reader.dimensions, args.tile_size,
                               mask_thresh=0.0)
    order = np.argsort(-pcts)[:args.n_tiles]
    tiles = [reader.read_region(tuple(locs[i]), 0,
                                (args.tile_size, args.tile_size))
             for i in order]
    lambdas = [float(v) for v in args.lambdas.split(",")]
    settings = {}
    for c in range(reader.n_channels):
        if c == args.af_channel:
            continue
        scores = {lam: residual_af_correlation(tiles, c, args.af_channel, lam)
                  for lam in lambdas}
        best = min(scores, key=scores.get)
        settings[str(c)] = {"lambda": best, "bias": 0.0}
        print(f"channel {c}: lambda={best} (residual AF corr "
              f"{scores[best]:.3f})")
    Path(args.out_json).write_text(json.dumps(settings, indent=2))
    reader.close()
    print(f"settings -> {args.out_json}")


if __name__ == "__main__":
    main()
