"""Convert an arbitrary (multi-page/tiled) TIFF into a tiled pyramidal
OME-TIFF (reference: preprocessings/convert_to_ometiff.py)."""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from mipheivit_tpu.slideio import (  # noqa: E402
    SlideReader,
    build_ome_xml,
    write_pyramid,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--channel_names", default=None,
                        help="comma-separated; defaults to ch0..chN")
    parser.add_argument("--n_levels", type=int, default=5)
    parser.add_argument("--tile_size", type=int, default=512)
    parser.add_argument("--mpp", type=float, default=0.0)
    args = parser.parse_args()

    reader = SlideReader(args.input)
    w, h = reader.dimensions
    arr = np.moveaxis(reader.read_region((0, 0), 0, (w, h)), -1, 0)
    names = (args.channel_names.split(",") if args.channel_names
             else [f"ch{i}" for i in range(arr.shape[0])])
    mpp = args.mpp or reader.mpp or 0.0
    xml = build_ome_xml(w, h, names, str(arr.dtype),
                        physical_size_um=mpp or None)
    write_pyramid(args.output, arr, n_levels=args.n_levels,
                  tile_size=args.tile_size, mpp=mpp, ome_xml=xml)
    reader.close()
    print(f"{args.input} -> {args.output} ({arr.shape[0]} channels, "
          f"{args.n_levels} levels)")


if __name__ == "__main__":
    main()
