"""Micro-batching online inference server (production serving surface).

New capability over the reference, which has no serving daemon — its only
inference surfaces are the offline batch drivers (`src/inference.py:183-186`
Trainer.predict over a CSV, and per-tile TIFF dumps). This module serves the
same generators interactively: concurrent single-tile HTTP requests are
coalesced into fixed-shape device batches (one compiled executable, no
retraces), run through the jitted forward, and fanned back out per request.

Design notes (TPU serving shape):
  * Fixed batch geometry — requests are padded up to ``batch_size`` so the
    executable never retraces; the padding rows are dead compute bounded by
    ``max_delay_ms`` of queueing.
  * uint8 at the wire AND at the PCIe boundary both ways: tiles upload as
    raw uint8 (H&E normalization is a channel affine, fused on device) and
    predictions are quantized to the reference's uint8 output codec
    (src/callbacks.py:344-346 semantics) on device before the fetch — the
    same transfer diet as the stitched WSI path (infer/wsi.py).
  * The device worker is a single thread: JAX dispatch is async, so the
    worker's only serialized cost is the host->device copy and the result
    fetch; request assembly happens on HTTP handler threads.

Protocol (stdlib-only, npy bodies):
  POST /v1/predict   body: .npy, uint8 [H,W,3] or [B,H,W,3] H&E tile(s)
                     resp: .npy, uint8 [H,W,C] (or [B,H,W,C]) mIF prediction
  GET  /healthz      {"status": "ok"} once the model is warmed up
  GET  /stats        rolling latency/occupancy counters (JSON)
"""

from __future__ import annotations

import io
import json
import logging
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional, Sequence

import numpy as np

log = logging.getLogger(__name__)

_SENTINEL = object()


class MicroBatcher:
    """Coalesce concurrent single-item requests into fixed-shape batches.

    ``fwd_np`` takes a uint8/f32 numpy batch [batch_size, ...] and returns a
    numpy batch of the same leading dim. Submissions block the caller only
    through the returned Future; batching runs on one worker thread which
    flushes when the batch is full or the oldest request has waited
    ``max_delay_ms``.
    """

    def __init__(self, fwd_np: Callable[[np.ndarray], np.ndarray],
                 batch_size: int, item_shape: tuple,
                 max_delay_ms: float = 5.0, in_dtype=np.uint8,
                 queue_depth: int = 256):
        self.fwd_np = fwd_np
        self.batch_size = int(batch_size)
        self.item_shape = tuple(item_shape)
        self.max_delay_s = float(max_delay_ms) / 1000.0
        self.in_dtype = np.dtype(in_dtype)
        self._q: queue.Queue = queue.Queue(maxsize=queue_depth)
        self._lock = threading.Lock()
        self._stats = {"n_requests": 0, "n_batches": 0, "n_padded_rows": 0}
        self._lat_ms: list = []          # rolling window, last 1024
        self._stopped = False
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="microbatch-worker")
        self._worker.start()

    def submit(self, item: np.ndarray) -> Future:
        if self._stopped:
            raise RuntimeError("MicroBatcher is stopped")
        item = np.asarray(item)
        if item.shape != self.item_shape or item.dtype != self.in_dtype:
            raise ValueError(
                f"expected {self.in_dtype} tile of shape {self.item_shape}, "
                f"got {item.dtype} {item.shape}")
        fut: Future = Future()
        self._q.put((item, fut, time.perf_counter()))
        return fut

    def stop(self) -> None:
        self._stopped = True
        self._q.put(_SENTINEL)
        self._worker.join(timeout=30)

    def stats(self) -> dict:
        with self._lock:
            out = dict(self._stats)
            lat = sorted(self._lat_ms)
        out["occupancy"] = (
            out["n_requests"] /
            max(out["n_batches"] * self.batch_size, 1))
        if lat:
            out["latency_ms_p50"] = lat[len(lat) // 2]
            out["latency_ms_p95"] = lat[min(len(lat) - 1,
                                            int(len(lat) * 0.95))]
        return out

    # -- worker ----------------------------------------------------------
    def _collect(self):
        """Block for the first request, then fill up to batch_size until the
        first request's deadline expires."""
        first = self._q.get()
        if first is _SENTINEL:
            return None
        batch = [first]
        deadline = first[2] + self.max_delay_s
        while len(batch) < self.batch_size:
            timeout = deadline - time.perf_counter()
            if timeout <= 0:
                break
            try:
                nxt = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is _SENTINEL:
                self._q.put(_SENTINEL)  # re-raise for the outer loop
                break
            batch.append(nxt)
        return batch

    def _run(self) -> None:
        while True:
            batch = self._collect()
            if batch is None:
                return
            n = len(batch)
            x = np.zeros((self.batch_size,) + self.item_shape, self.in_dtype)
            for i, (item, _, _) in enumerate(batch):
                x[i] = item
            try:
                y = self.fwd_np(x)
            except BaseException as e:  # surface device failures per-request
                for _, fut, _ in batch:
                    if not fut.cancelled():
                        fut.set_exception(e)
                continue
            t_done = time.perf_counter()
            with self._lock:
                self._stats["n_requests"] += n
                self._stats["n_batches"] += 1
                self._stats["n_padded_rows"] += self.batch_size - n
                for _, _, t0 in batch:
                    self._lat_ms.append(1000.0 * (t_done - t0))
                del self._lat_ms[:-1024]
            for i, (_, fut, _) in enumerate(batch):
                if not fut.cancelled():
                    fut.set_result(y[i])


def build_serving_fn(model, variables, he_normalizer,
                     tile_size: int, batch_size: int,
                     warmup: bool = True,
                     mesh=None) -> Callable[[np.ndarray], np.ndarray]:
    """Jitted uint8->uint8 forward: device-side H&E affine in, the
    reference's uint8 output codec ((y+0.9)/1.8*255, src/callbacks.py:344-346)
    out. Returns a numpy->numpy callable for MicroBatcher. With ``mesh``,
    the batch is sharded over the mesh's data axis (batch_size must divide
    by the data-parallel size) — same layout as the stitched WSI driver."""
    import jax
    import jax.numpy as jnp

    if he_normalizer.mean is None:
        raise ValueError("serving requires an H&E normalizer with stats "
                         "(mode='he')")
    nmean = jnp.asarray(he_normalizer.mean)[None]
    nstd = jnp.asarray(he_normalizer.std)[None]
    sharding = None
    if mesh is not None:
        from ..parallel import batch_sharding

        sharding = batch_sharding(mesh)

    @jax.jit
    def fwd(v, x_u8):
        x = (x_u8.astype(jnp.float32) - nmean) / nstd
        y = model.apply(v, x, train=False)
        y = jnp.clip((y + 0.9) / 1.8, 0.0, 1.0) * 255.0
        return jnp.rint(y).astype(jnp.uint8)

    def fwd_np(x: np.ndarray) -> np.ndarray:
        xj = jnp.asarray(x)
        if sharding is not None:
            xj = jax.device_put(xj, sharding)
        return np.asarray(fwd(variables, xj))

    if warmup:  # absorb the compile before /healthz goes green
        t0 = time.perf_counter()
        fwd_np(np.zeros((batch_size, tile_size, tile_size, 3), np.uint8))
        log.info("serving fn warmed up in %.1fs", time.perf_counter() - t0)
    return fwd_np


class TileServer:
    """HTTP front-end over a MicroBatcher. Construct with any numpy->numpy
    batch function (dependency injection for tests), or use
    ``TileServer.from_checkpoint`` for the production path."""

    def __init__(self, fwd_np, tile_size: int, batch_size: int,
                 channel_names: Optional[Sequence[str]] = None,
                 max_delay_ms: float = 5.0, host: str = "127.0.0.1",
                 port: int = 0):
        self.tile_size = int(tile_size)
        self.channel_names = list(channel_names or [])
        self.batcher = MicroBatcher(
            fwd_np, batch_size,
            item_shape=(self.tile_size, self.tile_size, 3),
            max_delay_ms=max_delay_ms)
        self._httpd = ThreadingHTTPServer((host, port), self._make_handler())
        self.host, self.port = self._httpd.server_address[:2]
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True, name="tile-server")

    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str, tile_size: int = 256,
                        batch_size: int = 32, max_delay_ms: float = 5.0,
                        host: str = "0.0.0.0", port: int = 8000,
                        dtype: Optional[str] = None,
                        mesh=None) -> "TileServer":
        import jax

        from ..config import load_yaml
        from ..data.stats import (Normalizer, get_input_mean_std,
                                  load_channel_stats)
        from .loading import load_generator, merge_lora

        cfg = load_yaml(f"{checkpoint_dir}/config.yaml")
        if dtype is None:
            dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
        channel_stats = load_channel_stats(cfg.data.channel_stats_path)
        nc_out = len(cfg.data.targ_channel_names)
        he_norm = Normalizer(get_input_mean_std(
            cfg.model.model_name, cfg.select("model.encoder.encoder_name"),
            channel_stats.rgb), mode="he")
        model, variables = load_generator(
            cfg, checkpoint_dir, (tile_size, tile_size), nc_out, dtype=dtype,
            fast_heads=cfg.model.model_name.startswith("myvitmatte"))
        if cfg.model.model_name.startswith("myvitmatte"):
            model, variables = merge_lora(model, variables)
        fwd_np = build_serving_fn(model, variables, he_norm,
                                  tile_size, batch_size, mesh=mesh)
        return cls(fwd_np, tile_size, batch_size,
                   channel_names=list(cfg.data.targ_channel_names),
                   max_delay_ms=max_delay_ms, host=host, port=port)

    def start(self) -> None:
        self._thread.start()
        log.info("serving on http://%s:%d (tile %d, batch %d)",
                 self.host, self.port, self.tile_size,
                 self.batcher.batch_size)

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self.batcher.stop()

    def serve_forever(self) -> None:
        self.start()
        try:
            self._thread.join()
        except KeyboardInterrupt:
            self.stop()

    # -- HTTP ------------------------------------------------------------
    def _make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, fmt, *args):  # route through logging
                log.debug("http: " + fmt, *args)

            def _send(self, code: int, body: bytes,
                      ctype: str = "application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _send_json(self, code: int, obj: dict):
                self._send(code, json.dumps(obj).encode())

            def do_GET(self):
                if self.path == "/healthz":
                    self._send_json(200, {"status": "ok"})
                elif self.path == "/stats":
                    self._send_json(200, server.batcher.stats())
                else:
                    self._send_json(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/v1/predict":
                    self._send_json(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    arr = np.load(io.BytesIO(self.rfile.read(n)),
                                  allow_pickle=False)
                except Exception as e:
                    self._send_json(400, {"error": f"bad npy body: {e}"})
                    return
                squeeze = arr.ndim == 3
                if squeeze:
                    arr = arr[None]
                ts = server.tile_size
                if (arr.ndim != 4 or arr.shape[1:] != (ts, ts, 3)
                        or arr.dtype != np.uint8
                        or arr.shape[0] > server.batcher.batch_size):
                    self._send_json(400, {
                        "error": "expected uint8 [H,W,3] or [B,H,W,3] with "
                                 f"H=W={ts}, B<={server.batcher.batch_size}, "
                                 f"got {arr.dtype} {arr.shape}"})
                    return
                try:
                    futs = [server.batcher.submit(t) for t in arr]
                    preds = np.stack([f.result(timeout=120) for f in futs])
                except Exception as e:
                    self._send_json(503, {"error": str(e)})
                    return
                buf = io.BytesIO()
                np.save(buf, preds[0] if squeeze else preds)
                self.send_response(200)
                self.send_header("Content-Type", "application/x-npy")
                if server.channel_names:
                    self.send_header("X-Markers",
                                     ",".join(server.channel_names))
                body = buf.getvalue()
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        return Handler
