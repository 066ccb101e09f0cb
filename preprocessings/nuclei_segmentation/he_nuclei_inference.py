"""H&E-side WSI nucleus segmentation (HoverFast role).

Reference: preprocessings/nuclei_segmentation/nuclei_he_wsi_hoverfast —
modified HoverFast producing polygon JSON, rasterized to WSI label masks
with watershed expansion. HoverFast is not installed here, so the backend
is pluggable: HoverFast polygons when available (rasterized via
``rasterize_polygons``), otherwise a classical fallback that extracts the
haematoxylin channel (HED deconvolution, ops/hed.py) and runs the same
distance-transform watershed as the DAPI path. Output contract identical:
2-channel (labels int32 + boundaries) pyramidal OME-TIFF.
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

from backends import classical_segment, expand_labels, find_boundaries  # noqa: E402
from wsi_nuclei_inference import segment_wsi  # noqa: E402
from mipheivit_tpu.ops.hed import rgb2hed  # noqa: E402
from mipheivit_tpu.slideio import (  # noqa: E402
    SlideReader,
    build_ome_xml,
    write_pyramid,
)


def hematoxylin_segment(rgb_tile: np.ndarray) -> np.ndarray:
    """Classical fallback: H-channel from HED deconvolution -> watershed."""
    hed = rgb2hed(rgb_tile.astype(np.float64) / 255.0)
    h_channel = (np.clip(hed[..., 0], 0, 1) * 255).astype(np.uint8)
    return classical_segment(h_channel)


def load_hoverfast_polygons(path):
    """HoverFast detection JSON(.gz): a list of GeoJSON-style features
    whose ``geometry.coordinates[0]`` is the nucleus exterior ring
    (reference: create_wsi_nuclei.py:148-155 reads exactly this from the
    ``<slide>.json.gz`` HoverFast emits). Plain point-list JSON is also
    accepted for hand-built fixtures."""
    import gzip

    if str(path).endswith(".gz"):
        with gzip.open(path, "rt") as f:
            data = json.loads(f.read())
    else:
        data = json.loads(Path(path).read_text())
    polys = []
    for item in data:
        if isinstance(item, dict):
            polys.append(item["geometry"]["coordinates"][0])
        else:
            polys.append(item)
    return polys


def rasterize_polygons(polygons, shape, expansion_px: float = 0.0) -> np.ndarray:
    """HoverFast polygon-JSON -> label raster (+ optional expansion)
    (reference: nuclei_he_wsi_hoverfast/create_wsi_nuclei.py role)."""
    import cv2

    labels = np.zeros(shape, np.int32)
    for i, poly in enumerate(polygons):
        pts = np.asarray(poly, np.int32).reshape(-1, 1, 2)
        cv2.fillPoly(labels, [pts], i + 1)
    return expand_labels(labels, expansion_px)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--slide_path", required=True, help="H&E WSI")
    parser.add_argument("--out_path", required=True)
    parser.add_argument("--polygons_json", default=None,
                        help="HoverFast polygon JSON; bypasses segmentation")
    parser.add_argument("--tile_size", type=int, default=2048)
    parser.add_argument("--halo", type=int, default=128)
    parser.add_argument("--expansion_px", type=float, default=3.0)
    args = parser.parse_args()

    reader = SlideReader(args.slide_path, mode="RGB")
    if args.polygons_json:
        polys = load_hoverfast_polygons(args.polygons_json)
        w, h = reader.dimensions
        labels = rasterize_polygons(polys, (h, w), args.expansion_px)
    else:
        labels = segment_wsi(reader, hematoxylin_segment, args.tile_size,
                             args.halo, dapi_channel=None)
        labels = expand_labels(labels, args.expansion_px)
    boundaries = find_boundaries(labels)
    stack = np.stack([labels, boundaries]).astype(np.int32)
    xml = build_ome_xml(labels.shape[1], labels.shape[0],
                        ["nuclei", "boundaries"], "int32",
                        physical_size_um=reader.mpp)
    write_pyramid(args.out_path, stack, n_levels=4, tile_size=512,
                  mpp=reader.mpp or 0.0, ome_xml=xml)
    reader.close()
    print(f"{labels.max()} nuclei -> {args.out_path}")


if __name__ == "__main__":
    main()
