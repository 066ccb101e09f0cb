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

from backends import classical_segment, expand_labels  # noqa: E402
from wsi_nuclei_inference import segment_wsi  # noqa: E402
from mipheivit_tpu.ops.hed import rgb2hed  # noqa: E402
from mipheivit_tpu.slideio import SlideReader  # noqa: E402


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
        # round (not truncate) float vertices — same convention as the
        # tiled rasterize_wsi_labels so the two paths are bit-identical
        pts = np.rint(np.asarray(poly, np.float64)).astype(
            np.int32).reshape(-1, 1, 2)
        cv2.fillPoly(labels, [pts], i + 1)
    return expand_labels(labels, expansion_px)


def _bucket_polygons(polygons, tile_size: int, halo: int, shape):
    """Grid bucketing by bbox — the first-party stand-in for the
    reference's shapely STRtree tile query (create_wsi_nuclei.py:81-92).
    Returns {(ty, tx): [(global_idx, poly_np), ...]}."""
    h, w = shape
    buckets: dict = {}
    for i, poly in enumerate(polygons):
        pts = np.asarray(poly, np.float64).reshape(-1, 2)
        x0, y0 = pts.min(axis=0) - halo
        x1, y1 = pts.max(axis=0) + halo
        tx0 = max(int(x0 // tile_size), 0)
        ty0 = max(int(y0 // tile_size), 0)
        tx1 = min(int(x1 // tile_size), max((w - 1) // tile_size, 0))
        ty1 = min(int(y1 // tile_size), max((h - 1) // tile_size, 0))
        for ty in range(ty0, ty1 + 1):
            for tx in range(tx0, tx1 + 1):
                buckets.setdefault((ty, tx), []).append((i, pts))
    return buckets


def rasterize_wsi_labels(polygons, shape, tile_size: int = 2048,
                         expansion_px: float = 4.0,
                         out=None) -> np.ndarray:
    """Bounded-RAM polygon-JSON -> whole-slide label plane.

    The reference streams this per 2048px tile (create_wsi_nuclei.py:
    89-114): polygons intersecting each tile are rasterized with their
    GLOBAL index as the label — a nucleus spanning a tile seam keeps ONE id
    in both tiles — then expanded by watershed into a disk(4)-dilated mask.
    Here each tile is processed with a halo wide enough that expansion
    cannot depend on out-of-tile pixels, and only the core is written, so
    the output is bit-identical to a whole-plane pass
    (tests/test_preprocessing.py asserts this). ``out`` may be an
    np.memmap; only one (tile + halo)^2 int32 scratch is ever resident.
    """
    h, w = shape
    if out is None:
        out = np.zeros((h, w), np.int32)
    halo = int(np.ceil(expansion_px)) + 2
    buckets = _bucket_polygons(polygons, tile_size, halo, shape)
    import cv2

    for (ty, tx), items in sorted(buckets.items()):
        y0 = max(ty * tile_size - halo, 0)
        x0 = max(tx * tile_size - halo, 0)
        y1 = min((ty + 1) * tile_size + halo, h)
        x1 = min((tx + 1) * tile_size + halo, w)
        tile = np.zeros((y1 - y0, x1 - x0), np.int32)
        # ascending global id = reference rasterize overwrite order
        # (rasterio paints shapes in list order; later shapes win ties)
        for gid, pts in sorted(items):
            p = np.rint(pts - [x0, y0]).astype(np.int32).reshape(-1, 1, 2)
            cv2.fillPoly(tile, [p], gid + 1)
        if expansion_px > 0:
            tile = expand_labels(tile, expansion_px)
        cy0, cx0 = ty * tile_size, tx * tile_size
        cy1 = min((ty + 1) * tile_size, h)
        cx1 = min((tx + 1) * tile_size, w)
        out[cy0:cy1, cx0:cx1] = tile[cy0 - y0:cy1 - y0, cx0 - x0:cx1 - x0]
    return out


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
        scratch = args.out_path + ".labels.raw"
        out = np.memmap(scratch, dtype=np.int32, mode="w+", shape=(h, w))
        labels = rasterize_wsi_labels(polys, (h, w), tile_size=args.tile_size,
                                      expansion_px=args.expansion_px, out=out)
    else:
        labels = segment_wsi(reader, hematoxylin_segment, args.tile_size,
                             args.halo, dapi_channel=None)
        labels = expand_labels(labels, args.expansion_px)
    # expansion already applied above (tiled/halo-consistent), so the
    # banded pyramid streamer only extracts boundaries (expansion_px=0)
    from wsi_nuclei_inference import stream_labels_pyramid

    stream_labels_pyramid(labels, args.out_path, reader.mpp or 0.0,
                          expansion_px=0.0)
    n = int(labels.max())
    reader.close()
    if args.polygons_json:
        del labels
        Path(args.out_path + ".labels.raw").unlink(missing_ok=True)
    print(f"{n} nuclei -> {args.out_path}")


if __name__ == "__main__":
    main()
