"""Convert an arbitrary (multi-page/tiled) TIFF into a tiled pyramidal
OME-TIFF (reference: preprocessings/convert_to_ometiff.py)."""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from mipheivit_tpu.slideio import (  # noqa: E402
    PyramidWriter,
    SlideReader,
    build_ome_xml,
)


def convert(input_path: str, output_path: str, channel_names=None,
            n_levels: int = 5, tile_size: int = 512, mpp: float = 0.0,
            band_rows: int = 2048) -> None:
    """Row-band streamed conversion: resident memory is one full-width band
    regardless of slide size."""
    reader = SlideReader(input_path)
    w, h = reader.dimensions
    names = (list(channel_names) if channel_names
             else [f"ch{i}" for i in range(reader.n_channels)])
    mpp = mpp or reader.mpp or 0.0
    xml = build_ome_xml(w, h, names, reader.dtype.name,
                        physical_size_um=mpp or None)
    with PyramidWriter(output_path, width=w, height=h,
                       n_channels=reader.n_channels, dtype=reader.dtype,
                       n_levels=n_levels, tile_size=tile_size, mpp=mpp,
                       ome_xml=xml) as writer:
        for ty in range(0, h, band_rows):
            bh = min(band_rows, h - ty)
            band = reader.read_region((0, ty), 0, (w, bh))
            writer.write_band(np.moveaxis(band, -1, 0))
    reader.close()
    print(f"{input_path} -> {output_path} ({reader.n_channels} channels, "
          f"{n_levels} levels)")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--channel_names", default=None,
                        help="comma-separated; defaults to ch0..chN")
    parser.add_argument("--n_levels", type=int, default=5)
    parser.add_argument("--tile_size", type=int, default=512)
    parser.add_argument("--mpp", type=float, default=0.0)
    parser.add_argument("--band_rows", type=int, default=2048)
    args = parser.parse_args()
    convert(args.input, args.output,
            args.channel_names.split(",") if args.channel_names else None,
            args.n_levels, args.tile_size, args.mpp, args.band_rows)


if __name__ == "__main__":
    main()
