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
import queue
import threading
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Sequence

import numpy as np

from ..slideio import (
    PyramidWriter,
    SlideReader,
    build_ome_xml,
    get_locs_otsu,
    write_pyramid,
)
from ..data.stats import Normalizer

log = logging.getLogger(__name__)


class _BandSink:
    """Array-shaped adapter so RollingAccumulator's sequential row writes
    stream straight into a PyramidWriter — no full-slide mosaic, neither in
    RAM nor as a memmap (the native writer spills to disk itself)."""

    def __init__(self, writer: PyramidWriter):
        self.writer = writer
        self.shape = (writer.n_channels, writer.height, writer.width)
        self.dtype = writer.dtype

    def __setitem__(self, key, value):
        self.writer.write_band(value)


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
        # channel-LAST ring buffer: per-tile accumulation writes rows of
        # [cw, C] contiguously instead of striding across C whole-width
        # planes (measured 2.2x faster per add), and finalizing rows just
        # advances the ring offset instead of memmove-ing the whole band
        # (the shift was ~70 ms per tile row at 4k width). The transpose to
        # the [C, rows, W] output contract happens once per finalized band.
        self.acc = np.zeros((self.band_rows, self.w, self.c), np.float32)
        self.wsum = np.zeros((self.band_rows, self.w, 1), np.float32)
        self.base = 0            # slide row corresponding to logical row 0
        self.off = 0             # ring offset of logical row 0

    def _row_spans(self, r0: int, n: int):
        """Logical band rows [r0, r0+n) -> up to two physical ring spans."""
        p0 = (self.off + r0) % self.band_rows
        first = min(n, self.band_rows - p0)
        yield slice(p0, p0 + first), 0, first
        if first < n:
            yield slice(0, n - first), first, n

    def _flush_to(self, new_base: int):
        """Finalize slide rows [self.base, new_base)."""
        new_base = min(new_base, self.h)
        while self.base < new_base:
            n = min(new_base - self.base, self.band_rows)
            for span, s0, s1 in self._row_spans(0, n):
                chunk = self.acc[span] / np.maximum(self.wsum[span], 1e-6)
                self.out[:, self.base + s0:self.base + s1] = \
                    np.ascontiguousarray(
                        chunk.astype(self.out.dtype).transpose(2, 0, 1))
                self.acc[span] = 0.0
                self.wsum[span] = 0.0
            self.off = (self.off + n) % self.band_rows
            self.base += n

    def add(self, pred_hwc: np.ndarray, tx: int, ty: int,
            window: np.ndarray, pre_windowed: bool = False):
        """``pre_windowed``: the blend window was already multiplied into
        ``pred_hwc`` (e.g. fused into the device forward); only the weight
        plane is accumulated host-side then."""
        if ty > self.base + self.band_rows - pred_hwc.shape[0]:
            self._flush_to(ty - (self.band_rows - pred_hwc.shape[0]))
        if ty < self.base:
            raise ValueError("tiles must arrive in raster (y-ascending) order")
        cw = min(pred_hwc.shape[1], self.w - tx)
        ch = min(pred_hwc.shape[0], self.h - ty)
        xsl = slice(tx, tx + cw)
        for span, s0, s1 in self._row_spans(ty - self.base, ch):
            if pre_windowed:
                self.acc[span, xsl] += pred_hwc[s0:s1, :cw]
            else:
                self.acc[span, xsl] += \
                    pred_hwc[s0:s1, :cw] * window[s0:s1, :cw, None]
            self.wsum[span, xsl] += window[s0:s1, :cw, None]

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
    read_workers: int = 8,
    queue_depth: int = 4,
    dispatch_depth: int = 2,
    fetch_workers: int = 4,
    stats: Optional[dict] = None,
    seq_shard_mesh=None,
    fetch_uint8: bool = False,
) -> str:
    """Memory is bounded regardless of slide size: the rolling f32
    accumulator is one tile band, and finalized uint8 rows stream straight
    into the native PyramidWriter (disk spill). ``memmap_path`` additionally
    keeps the raw [C, H, W] mosaic on disk as a np.memmap side product.

    The host loop is a three-stage pipeline (this is the benchmark path for
    the >=5x whole-slide target, SURVEY.md §2.2):

      reader threads -> batch queue -> async device dispatch -> stitcher

    ``read_workers`` threads decode tiles ahead of compute into a bounded
    queue of ready batches (depth ``queue_depth``); the main thread keeps up
    to ``dispatch_depth`` jitted forward calls in flight (JAX async dispatch)
    and only blocks on the oldest result while the device is already working
    on the next — so tile decode and overlap stitching both hide behind TPU
    compute. ``fetch_workers`` device->host result copies additionally run
    concurrently (stitching still consumes them in dispatch order, which the
    raster-order accumulator requires): on PCIe-local hardware one fetch
    never stalls the pipeline, but when predictions egress over a network
    (or this dev box's tunnel) overlapping the streams is the difference
    between transfer-bound and compute-bound. Per-phase timers
    (read-starvation vs device wait) are logged at the end so
    host-boundedness is visible."""
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

    xml = build_ome_xml(w, h, channel_names, "uint8",
                        physical_size_um=reader.mpp)
    writer = None
    if memmap_path:
        # kept for callers that want the raw mosaic on disk as a side
        # product; the default path below needs no mosaic at all.
        out = np.memmap(memmap_path, dtype=np.uint8, mode="w+",
                        shape=(n_ch, h, w))
    else:
        writer = PyramidWriter(
            out_path, width=w, height=h, n_channels=n_ch, dtype=np.uint8,
            n_levels=n_pyramid_levels, tile_size=min(512, tile_size),
            mpp=reader.mpp or 0.0, ome_xml=xml)
        out = _BandSink(writer)
    rolling = RollingAccumulator(out, tile_size, stride)
    window = _blend_window(tile_size, overlap)

    # clip/scale fused into the jitted forward: one less host pass over the
    # prediction and XLA fuses it into the last decoder op. Host<->device
    # traffic is minimized for the serving path: H&E normalization is a
    # pure channel affine, so tiles upload as raw uint8 (4x smaller) and
    # predictions come back f16 (2x smaller; they only feed the f32
    # feathered accumulator and a uint8 quantizer, so f16 rounding is
    # far below the output LSB) or uint8 (fetch_uint8, see below).
    device_norm = he_normalizer.mode == "he" and he_normalizer.mean is not None
    # the blend window is also applied on device (one fused multiply there
    # vs a 4 MB/tile host multiply in the stitcher — the host add then is a
    # pure strided +=, measured ~1.8x faster per tile).
    # ``fetch_uint8``: round the UNwindowed prediction to uint8 on device —
    # the fetch is 2x smaller than f16 (a real serving-egress win; on the
    # tunneled dev box it halves the dominant transfer). The window must
    # then be applied host-side: each contribution is pred±0.5 LSB, so the
    # weighted mean sum(w·(pred±0.5))/sum(w) is within 0.5 LSB everywhere —
    # quantizing the *windowed* value instead would blow up wherever the
    # taper weight is small and unopposed (slide borders: w≈1e-3 covered by
    # one tile → rint(w·pred)=0 → the pixel reads 0).
    win_dev = jnp.asarray(window)[None, :, :, None]
    if fetch_uint8:
        out_cast = lambda y: jnp.rint(y).astype(jnp.uint8)  # noqa: E731
    else:
        # f16 fetch: fuse the window multiply into the device forward (one
        # fused op there vs a 4 MB/tile host multiply; f16 keeps relative
        # precision at any window scale, so pre-windowing is safe)
        out_cast = lambda y: (y * win_dev).astype(jnp.float16)  # noqa: E731
    if device_norm:
        nmean = jnp.asarray(he_normalizer.mean)[None]
        nstd = jnp.asarray(he_normalizer.std)[None]
        fwd = jax.jit(lambda v, x: out_cast(jnp.clip(
            (model.apply(v, (x.astype(jnp.float32) - nmean) / nstd,
                         train=False) + 0.9) / 1.8, 0.0, 1.0) * 255.0))
    else:
        fwd = jax.jit(lambda v, x: out_cast(jnp.clip(
            (model.apply(v, x, train=False) + 0.9) / 1.8, 0.0, 1.0) * 255.0))
    if seq_shard_mesh is not None:
        # whole-region serving: the model was built with
        # attn_impl="seq_shard" and tile_size is region-sized (e.g. 1024+);
        # every forward traces/runs under the scope so its attention
        # shard_maps over this mesh's model axis (parallel/seq.py)
        from ..parallel.seq import seq_shard_scope

        base_fwd = fwd

        def fwd(v, x, _f=base_fwd):  # noqa: F811
            with seq_shard_scope(seq_shard_mesh):
                return _f(v, x)

    sharding = None
    if mesh is not None:
        from ..parallel import batch_sharding

        sharding = batch_sharding(mesh)

    # ---- stage 1: reader threads fill a bounded queue of ready batches ----
    batch_q: queue.Queue = queue.Queue(maxsize=queue_depth)
    producer_err: list = []

    def _fetch(loc):
        tx, ty = int(loc[0]), int(loc[1])
        tile = reader.read_region((tx, ty), level, (tile_size, tile_size))
        if device_norm:
            return np.ascontiguousarray(tile), (tx, ty)
        return np.asarray(he_normalizer(tile), np.float32), (tx, ty)

    read_ahead = max(read_workers * 2, batch_size)

    def _producer():
        try:
            with ThreadPoolExecutor(read_workers) as pool:
                inflight: deque = deque()
                idx = 0
                tiles, coords = [], []
                while idx < len(locs) or inflight:
                    while idx < len(locs) and len(inflight) < read_ahead:
                        inflight.append(pool.submit(_fetch, locs[idx]))
                        idx += 1
                    tile, coord = inflight.popleft().result()
                    tiles.append(tile)
                    coords.append(coord)
                    if len(tiles) == batch_size:
                        batch_q.put((np.stack(tiles), coords))
                        tiles, coords = [], []
                if tiles:
                    batch_q.put((np.stack(tiles), coords))
        except BaseException as e:  # surface reader failures to the consumer
            producer_err.append(e)
        finally:
            batch_q.put(None)

    threading.Thread(target=_producer, daemon=True,
                     name="wsi-read-producer").start()

    # ---- stages 2-4: async dispatch -> overlapped fetch -> ordered stitch --
    read_wait_s = 0.0
    device_wait_s = 0.0
    stitch_s = 0.0
    t_wall0 = time.perf_counter()
    t_first_drain = None       # steady-state marker (past the jit compile)
    tiles_drained = 0
    pending: deque = deque()      # dispatched, fetch not yet started
    fetching: deque = deque()     # (future(preds), coords, n) — FIFO = order
    fetch_pool = ThreadPoolExecutor(max(1, fetch_workers),
                                    thread_name_prefix="wsi-fetch")

    def _fetch_pred(pred_dev, n):
        # fetch in f16 (half the transfer), but widen immediately: numpy
        # f16 arithmetic is scalar-emulated (~50x slower) and would move
        # the bottleneck into the feathered accumulator
        return np.asarray(pred_dev)[:n].astype(np.float32)

    def _start_fetch():
        pred_dev, coords, n = pending.popleft()
        fetching.append(
            (fetch_pool.submit(_fetch_pred, pred_dev, n), coords, n))

    def _stitch_one():
        """Block on the OLDEST in-flight fetch (dispatch order — the rolling
        accumulator needs raster order) and feather it in."""
        nonlocal device_wait_s, stitch_s, t_first_drain, tiles_drained
        fut, coords, n = fetching.popleft()
        first = t_first_drain is None
        t0 = time.perf_counter()
        preds = fut.result()
        t1 = time.perf_counter()
        if not first:
            # pipeline-stall accounting: time the stitcher actually waited
            # on the transfer (overlapped fetches don't double-count), with
            # the compile-absorbing first batch skipped so the accumulated
            # device-wait matches the steady window it is subtracted from
            device_wait_s += t1 - t0
        for pred, (tx, ty) in zip(preds, coords):
            rolling.add(pred, tx, ty, window, pre_windowed=not fetch_uint8)
        stitch_s += time.perf_counter() - t1
        if t_first_drain is None:
            t_first_drain = time.perf_counter()
        tiles_drained += n

    n_batches = 0
    n_tiles_seen = 0
    while True:
        t0 = time.perf_counter()
        item = batch_q.get()
        read_wait_s += time.perf_counter() - t0
        if item is None:
            break
        x, coords = item
        n = x.shape[0]
        if n < batch_size:
            x = np.concatenate(
                [x, np.zeros((batch_size - n,) + x.shape[1:], x.dtype)])
        xj = jnp.asarray(x)
        if sharding is not None:
            xj = jax.device_put(xj, sharding)
        pending.append((fwd(variables, xj), coords, n))
        n_batches += 1
        n_tiles_seen += n
        if n_batches % 4 == 0:
            log.info("WSI progress: %d/%d tiles", n_tiles_seen, len(locs))
        while len(pending) > dispatch_depth:
            _start_fetch()
        while len(fetching) > max(1, fetch_workers):
            _stitch_one()
    while pending:
        _start_fetch()
    while fetching:
        _stitch_one()
    fetch_pool.shutdown()
    if producer_err:
        raise producer_err[0]

    t_drained = time.perf_counter()
    rolling.finalize()
    finalize_s = time.perf_counter() - t_drained
    if n_batches:
        log.info(
            "WSI pipeline: %d batches, read-starvation %.1f ms/batch, "
            "device-wait %.1f ms/batch (steady window)",
            n_batches, 1000.0 * read_wait_s / n_batches,
            1000.0 * device_wait_s / max(n_batches - 1, 1))
    if stats is not None:
        stats.update({
            "n_tiles": int(n_tiles_seen), "n_batches": int(n_batches),
            "batch_size": int(batch_size),
            "wall_s": t_drained - t_wall0,
            # steady state: everything after the first drained batch (the
            # first batch absorbs the jit compile of the forward)
            "steady_s": (t_drained - t_first_drain
                         if t_first_drain is not None else 0.0),
            "steady_tiles": int(max(tiles_drained - batch_size, 0)),
            "steady_batches": int(max(n_batches - 1, 0)),
            "read_wait_s": read_wait_s, "device_wait_s": device_wait_s,
            "stitch_s": stitch_s, "finalize_s": finalize_s,
        })
    if writer is not None:
        writer.close()
    else:
        write_pyramid(out_path, out, n_levels=n_pyramid_levels,
                      tile_size=min(512, tile_size), mpp=reader.mpp or 0.0,
                      ome_xml=xml)
    reader.close()
    log.info("wrote stitched mIF pyramid to %s", out_path)
    return out_path
