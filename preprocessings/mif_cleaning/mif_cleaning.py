"""mIF WSI cleaning: autofluorescence subtraction + log1p/p99 quantization.

Reference: preprocessings/mif_cleaning/mif_cleaning.py — two passes:

  pass 1 (:189-294): per-channel global histograms over Otsu-tissue tiles of
    the AF-subtracted signal ``ch - lambda * AF + bias`` (lambda/bias per
    channel from a JSON settings file, hand-tuned in a napari GUI in the
    reference; the settings-file contract is preserved). Pixels at zero and
    pixels where the artifact channel exceeds the threshold are excluded
    (reference :266-278); at most ``max_tiles`` tiles are sampled per slide
    (reference :226-229). The histogram yields the p99 bin per channel.
  pass 2 (:111-182): rewrite every channel as
    ``uint8(clip(log1p(x / p99), 0, 1) * 255)``, assembled into a tiled
    pyramidal OME-TIFF.

Memory is bounded: pass 2 streams full-width row bands through the native
``PyramidWriter`` (disk spill, one band resident — the counterpart of the
reference's per-channel temp TIFFs + arrayjoin, :157-182), and the per-band
arithmetic is vectorized numpy over all channels at once.
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

from mipheivit_tpu.slideio import (  # noqa: E402
    PyramidWriter,
    SlideReader,
    build_ome_xml,
    get_locs_otsu,
)


def af_subtract(tile: np.ndarray, af: np.ndarray, lam: float,
                bias: float) -> np.ndarray:
    """ch - lambda * AF + bias, clipped at 0 (reference: :281-285)."""
    out = tile.astype(np.float32) - lam * af.astype(np.float32) + bias
    return np.maximum(out, 0.0)


def settings_vectors(settings: dict, n_ch: int, af_channel: int):
    """Per-channel (lambda, bias) vectors; AF channel gets lambda 0."""
    lam = np.zeros(n_ch, np.float32)
    bias = np.zeros(n_ch, np.float32)
    for c in range(n_ch):
        ch_cfg = settings.get(str(c), {})
        lam[c] = float(ch_cfg.get("lambda", 0.0)) if c != af_channel else 0.0
        bias[c] = float(ch_cfg.get("bias", 0.0))
    return lam, bias


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
                       mask_thresh: float = 0.05,
                       artifact_channel: int = None,
                       artifact_threshold: float = 2000.0,
                       max_tiles: int = 500, seed: int = 42):
    """Pass 1: per-channel histograms of AF-subtracted tissue signal.

    Zero pixels are excluded, and — when ``artifact_channel`` is given —
    pixels whose artifact-channel value is >= ``artifact_threshold``
    (reference :266-278: imaging artifacts would otherwise dominate the
    upper-percentile bins that set the quantization scale)."""
    thumb = reader.get_thumbnail((1024, 1024))
    locs, _ = get_locs_otsu(thumb, reader.dimensions, tile_size,
                            mask_thresh=mask_thresh)
    if len(locs) > max_tiles:      # reference samples 500 tiles (:226-229)
        keep = np.random.default_rng(seed).choice(
            len(locs), max_tiles, replace=False)
        locs = locs[keep]
    n_ch = reader.n_channels
    lam, bias = settings_vectors(settings, n_ch, af_channel)
    hists = np.zeros((n_ch, n_bins), np.int64)
    edges = np.linspace(0, value_range, n_bins + 1)
    for (tx, ty) in locs:
        tile = reader.read_region((int(tx), int(ty)), 0,
                                  (tile_size, tile_size)).astype(np.float32)
        af = tile[..., af_channel:af_channel + 1]
        clean = np.maximum(tile - lam * af + bias, 0.0)
        ok = np.ones(tile.shape[:2], bool)
        if artifact_channel is not None:
            ok &= tile[..., artifact_channel] < artifact_threshold
        for c in range(n_ch):
            vals = clean[..., c][ok & (clean[..., c] > 0)]
            h, _ = np.histogram(vals, bins=edges)
            hists[c] += h
    return hists, edges


def apply_cleaning_wsi(reader: SlideReader, settings: dict, af_channel: int,
                       p99: np.ndarray, out_path: str, channel_names,
                       band_rows: int = 256):
    """Pass 2: full rewrite with log1p/p99 quantization to uint8, streamed
    through the banded pyramid writer — resident memory is one full-width
    row band (``n_ch * band_rows * W``), never the slide."""
    w, h = reader.dimensions
    n_ch = reader.n_channels
    lam, bias = settings_vectors(settings, n_ch, af_channel)
    p99 = np.asarray(p99, np.float32).reshape(1, 1, n_ch)
    xml = build_ome_xml(w, h, channel_names, "uint8",
                        physical_size_um=reader.mpp)
    with PyramidWriter(out_path, width=w, height=h, n_channels=n_ch,
                       dtype=np.uint8, n_levels=4, tile_size=512,
                       mpp=reader.mpp or 0.0, ome_xml=xml) as writer:
        for ty in range(0, h, band_rows):
            bh = min(band_rows, h - ty)
            band = reader.read_region((0, ty), 0, (w, bh)).astype(np.float32)
            af = band[..., af_channel:af_channel + 1]
            clean = np.maximum(band - lam * af + bias, 0.0)
            q = np.clip(np.log1p(clean / p99), 0.0, 1.0) * 255.0
            writer.write_band(np.moveaxis(q.astype(np.uint8), -1, 0))


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
    parser.add_argument("--band_rows", type=int, default=256)
    parser.add_argument("--artifact_channel_name", default=None,
                        help="channel whose bright pixels mark imaging "
                             "artifacts (reference --artifact_channel_name)")
    parser.add_argument("--artifact_threshold", type=float, default=2000.0)
    args = parser.parse_args()

    settings = json.loads(Path(args.lambda_settings).read_text())
    names = args.channel_names.split(",")
    artifact_channel = (names.index(args.artifact_channel_name)
                        if args.artifact_channel_name else None)
    reader = SlideReader(args.slide_path, mode="IF")
    hists, edges = extract_histograms(
        reader, settings, args.af_channel, args.tile_size,
        artifact_channel=artifact_channel,
        artifact_threshold=args.artifact_threshold)
    p99 = np.array([find_percentile_bin(hists[c], edges)
                    for c in range(reader.n_channels)])
    print("p99 per channel:", np.round(p99, 1))
    # (--tile_size only affects pass 1's AF-lambda sampling; pass 2 streams
    # full-width bands sized by --band_rows)
    apply_cleaning_wsi(reader, settings, args.af_channel, p99, args.out_path,
                       names, band_rows=args.band_rows)
    reader.close()
    print(f"cleaned WSI -> {args.out_path}")


if __name__ == "__main__":
    main()
