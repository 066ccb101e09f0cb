"""WSI-scale nucleus segmentation with cross-tile label merging.

Reference: preprocessings/nuclei_segmentation/nuclei_dapi_wsi_cellpose/
cellpose_wsi_inference.py — rescale the DAPI channel to ~0.325 mpp, tile
with halo, segment per tile, keep only instances owned by the tile interior
(halo overlap resolves split nuclei: :225-249), offset ids by the global
max, relabel sequentially (:253-256), expand nuclei by ~1/mpp px
(:258-274), and write a 2-channel (labels int32 + boundaries) pyramidal
OME-TIFF (:278-305).

The segmentation backend is pluggable (CellPose when installed, classical
watershed otherwise — see backends.py). For CellPose the reference's HDF5
float16 flow-spill is unnecessary here because tiles are segmented
independently with halo-ownership merging, which bounds RAM the same way.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

from backends import expand_labels, find_boundaries, get_backend  # noqa: E402
from mipheivit_tpu.slideio import (  # noqa: E402
    SlideReader,
    build_ome_xml,
    write_pyramid,
)


def segment_wsi(reader: SlideReader, segment_fn, tile_size: int = 2048,
                halo: int = 128, dapi_channel=0,
                expansion_px: float = 3.0) -> np.ndarray:
    """``dapi_channel``: int channel index fed to ``segment_fn``; pass None
    to hand the full HWC tile over (H&E backends)."""
    w, h = reader.dimensions
    labels = np.zeros((h, w), np.int32)
    next_id = 0
    stride = tile_size
    for ty in range(0, h, stride):
        for tx in range(0, w, stride):
            x0, y0 = max(tx - halo, 0), max(ty - halo, 0)
            x1 = min(tx + tile_size + halo, w)
            y1 = min(ty + tile_size + halo, h)
            tile = reader.read_region((x0, y0), 0, (x1 - x0, y1 - y0))
            if dapi_channel is None:
                tile_labels = segment_fn(tile)
            else:
                tile_labels = segment_fn(tile[..., dapi_channel])

            # interior ownership: keep instances whose pixels majority-fall
            # inside the halo-free core (reference merge rule :225-249)
            core = np.zeros_like(tile_labels, bool)
            core[ty - y0: min(ty + tile_size, h) - y0,
                 tx - x0: min(tx + tile_size, w) - x0] = True
            ids = np.unique(tile_labels[tile_labels > 0])
            if len(ids) == 0:
                continue
            keep = []
            for lab in ids:
                mask = tile_labels == lab
                if mask[core].sum() * 2 >= mask.sum():
                    keep.append(lab)
            if not keep:
                continue
            remap = np.zeros(int(tile_labels.max()) + 1, np.int32)
            for j, lab in enumerate(keep):
                remap[lab] = next_id + j + 1
            next_id += len(keep)
            owned = remap[tile_labels]
            region = labels[y0:y1, x0:x1]
            region[owned > 0] = owned[owned > 0]
            labels[y0:y1, x0:x1] = region

    # sequential relabel
    uniq = np.unique(labels)
    uniq = uniq[uniq > 0]
    lut = np.zeros(int(labels.max()) + 1, np.int32)
    lut[uniq] = np.arange(1, len(uniq) + 1, dtype=np.int32)
    labels = lut[labels]
    if expansion_px > 0:
        labels = expand_labels(labels, expansion_px)
    return labels


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--slide_path", required=True)
    parser.add_argument("--out_path", required=True)
    parser.add_argument("--backend", default="auto",
                        choices=["auto", "cellpose", "classical"])
    parser.add_argument("--dapi_channel", type=int, default=0)
    parser.add_argument("--tile_size", type=int, default=2048)
    parser.add_argument("--halo", type=int, default=128)
    parser.add_argument("--expansion_px", type=float, default=3.0)
    args = parser.parse_args()

    reader = SlideReader(args.slide_path, mode="IF")
    segment_fn = get_backend(args.backend)
    labels = segment_wsi(reader, segment_fn, args.tile_size, args.halo,
                         args.dapi_channel, args.expansion_px)
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
