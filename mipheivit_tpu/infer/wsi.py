"""Sliding-window whole-slide inference with on-the-fly overlap stitching.

New capability over the reference (which only writes per-tile TIFFs —
src/callbacks.py:330-351); this is the "sharded sliding-window WSI
inference" component from SURVEY.md §2.2/§5: the WSI tile grid is the
data-parallel unit, each batch runs the jitted generator (optionally
batch-sharded over a mesh), and overlapping predictions are feathered with
a separable raised-cosine window into full-slide accumulators, then emitted
as a pyramidal OME-TIFF via the native writer.

The host side streams tiles through the threaded reader; the device only
ever sees fixed-shape batches (one compilation).
"""

from __future__ import annotations

import logging
from typing import Sequence

import numpy as np

from ..slideio import SlideReader, build_ome_xml, get_locs_otsu, write_pyramid
from ..data.stats import Normalizer

log = logging.getLogger(__name__)


def _blend_window(tile: int, overlap: int) -> np.ndarray:
    """Separable weight window: 1 in the core, cosine taper over the
    overlap margin. Guarantees sum-normalization is smooth at seams."""
    w = np.ones(tile, np.float32)
    if overlap > 0:
        ramp = 0.5 - 0.5 * np.cos(np.pi * (np.arange(overlap) + 0.5) / overlap)
        w[:overlap] = ramp
        w[tile - overlap:] = ramp[::-1]
    return np.outer(w, w)


def wsi_inference(
    model,
    variables,
    slide_path: str,
    out_path: str,
    channel_names: Sequence[str],
    he_normalizer: Normalizer,
    tile_size: int = 256,
    overlap: int = 64,
    batch_size: int = 16,
    level: int = 0,
    tissue_only: bool = True,
    mask_thresh: float = 0.0,
    mesh=None,
    n_pyramid_levels: int = 4,
) -> str:
    import jax
    import jax.numpy as jnp

    reader = SlideReader(slide_path, mode="RGB")
    w, h = reader.level_dimensions[level]
    n_ch = len(channel_names)
    stride = tile_size - overlap

    if tissue_only:
        thumb = reader.get_thumbnail((2048, 2048))
        ds = reader.level_downsample(level)
        locs, _ = get_locs_otsu(thumb, reader.dimensions,
                                tile_size * ds, tile_overlap=overlap * ds,
                                mask_thresh=mask_thresh)
        locs = (locs / ds).astype(np.int64)
    else:
        xs = np.arange(0, max(w - overlap, 1), stride)
        ys = np.arange(0, max(h - overlap, 1), stride)
        locs = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2)
    log.info("WSI %s: %dx%d, %d tiles", slide_path, w, h, len(locs))

    acc = np.zeros((n_ch, h, w), np.float32)
    wsum = np.zeros((h, w), np.float32)
    window = _blend_window(tile_size, overlap)

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    sharding = None
    if mesh is not None:
        from ..parallel import batch_sharding

        sharding = batch_sharding(mesh)

    def run_batch(tiles, coords):
        x = np.stack(tiles)
        n = x.shape[0]
        if n < batch_size:
            x = np.concatenate(
                [x, np.zeros((batch_size - n,) + x.shape[1:], x.dtype)])
        xj = jnp.asarray(x)
        if sharding is not None:
            xj = jax.device_put(xj, sharding)
        preds = np.asarray(fwd(variables, xj))[:n]
        preds = np.clip((preds + 0.9) / 1.8, 0.0, 1.0) * 255.0
        for pred, (tx, ty) in zip(preds, coords):
            cw = min(tile_size, w - tx)
            chh = min(tile_size, h - ty)
            win = window[:chh, :cw]
            acc[:, ty:ty + chh, tx:tx + cw] += \
                pred[:chh, :cw].transpose(2, 0, 1) * win
            wsum[ty:ty + chh, tx:tx + cw] += win

    tiles, coords = [], []
    for (tx, ty) in locs:
        tile = reader.read_region((int(tx), int(ty)), level,
                                  (tile_size, tile_size))
        tiles.append(np.asarray(he_normalizer(tile), np.float32))
        coords.append((int(tx), int(ty)))
        if len(tiles) == batch_size:
            run_batch(tiles, coords)
            tiles, coords = [], []
    if tiles:
        run_batch(tiles, coords)

    out = (acc / np.maximum(wsum, 1e-6)[None]).astype(np.uint8)
    xml = build_ome_xml(w, h, channel_names, "uint8",
                        physical_size_um=reader.mpp)
    write_pyramid(out_path, out, n_levels=n_pyramid_levels,
                  tile_size=min(512, tile_size), mpp=reader.mpp or 0.0,
                  ome_xml=xml)
    reader.close()
    log.info("wrote stitched mIF pyramid to %s", out_path)
    return out_path
