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
from typing import Optional, Sequence

import numpy as np

from ..slideio import SlideReader, build_ome_xml, get_locs_otsu, write_pyramid
from ..data.stats import Normalizer

log = logging.getLogger(__name__)


class RollingAccumulator:
    """Bounded-memory overlap accumulator for raster-order tile streams.

    Keeps only the rows that can still receive contributions (one tile
    height + overlap) in RAM as f32; rows that fall behind the write
    frontier are finalized to uint8 into ``out`` (an array or np.memmap of
    shape [C, H, W]) — this is what makes gigapixel slides feasible: the
    f32 working set is a band, not the slide (SURVEY.md §5 long-context:
    per-channel streaming to bound RAM)."""

    def __init__(self, out: np.ndarray, tile_size: int, stride: int):
        self.out = out
        self.c, self.h, self.w = out.shape
        self.band_rows = tile_size + stride
        self.acc = np.zeros((self.c, self.band_rows, self.w), np.float32)
        self.wsum = np.zeros((self.band_rows, self.w), np.float32)
        self.base = 0            # slide row corresponding to acc row 0

    def _flush_to(self, new_base: int):
        """Finalize slide rows [self.base, new_base)."""
        new_base = min(new_base, self.h)
        while self.base < new_base:
            n = min(new_base - self.base, self.band_rows)
            chunk = self.acc[:, :n] / np.maximum(self.wsum[None, :n], 1e-6)
            self.out[:, self.base:self.base + n] = chunk.astype(self.out.dtype)
            if n < self.band_rows:
                self.acc[:, :-n] = self.acc[:, n:]
                self.wsum[:-n] = self.wsum[n:]
            self.acc[:, -n:] = 0.0
            self.wsum[-n:] = 0.0
            self.base += n

    def add(self, pred_hwc: np.ndarray, tx: int, ty: int,
            window: np.ndarray):
        if ty > self.base + self.band_rows - pred_hwc.shape[0]:
            self._flush_to(ty - (self.band_rows - pred_hwc.shape[0]))
        if ty < self.base:
            raise ValueError("tiles must arrive in raster (y-ascending) order")
        cw = min(pred_hwc.shape[1], self.w - tx)
        ch = min(pred_hwc.shape[0], self.h - ty)
        win = window[:ch, :cw]
        y0 = ty - self.base
        self.acc[:, y0:y0 + ch, tx:tx + cw] += \
            pred_hwc[:ch, :cw].transpose(2, 0, 1) * win
        self.wsum[y0:y0 + ch, tx:tx + cw] += win

    def finalize(self):
        self._flush_to(self.h)


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
    memmap_path: Optional[str] = None,
) -> str:
    """``memmap_path``: spill the finalized uint8 mosaic to a disk-backed
    np.memmap instead of RAM (gigapixel slides); the rolling f32
    accumulator is a band either way."""
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
    # raster order is required by the rolling accumulator
    locs = locs[np.lexsort((locs[:, 0], locs[:, 1]))]
    log.info("WSI %s: %dx%d, %d tiles", slide_path, w, h, len(locs))

    if memmap_path:
        out = np.memmap(memmap_path, dtype=np.uint8, mode="w+",
                        shape=(n_ch, h, w))
    else:
        out = np.zeros((n_ch, h, w), np.uint8)
    rolling = RollingAccumulator(out, tile_size, stride)
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
            rolling.add(pred, tx, ty, window)

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

    rolling.finalize()
    xml = build_ome_xml(w, h, channel_names, "uint8",
                        physical_size_um=reader.mpp)
    write_pyramid(out_path, out, n_levels=n_pyramid_levels,
                  tile_size=min(512, tile_size), mpp=reader.mpp or 0.0,
                  ome_xml=xml)
    reader.close()
    log.info("wrote stitched mIF pyramid to %s", out_path)
    return out_path
