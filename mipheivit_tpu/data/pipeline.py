"""Host input pipeline: threaded decode -> batch -> double-buffered device put.

The reference hides tile-decode latency in ~31 DataLoader worker processes
(reference: src/dataset.py:43). Here decode runs in a thread pool (PIL/cv2/
libtiff release the GIL) feeding a bounded queue; ``device_prefetch`` keeps
the next batch in flight with ``jax.device_put`` while the current one
computes — the standard JAX double-buffer.

Per-host sharding for multi-host training: pass ``shard_index``/
``num_shards`` so each host walks a disjoint slice of the epoch indices
(SURVEY.md §5 "distributed communication backend" note).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator

import numpy as np


class PipelineStats:
    """Per-phase timers for the input pipeline (SURVEY.md §5 tracing note:
    the reference has only tqdm; here decode/wait times are measured so
    host-boundedness is visible in metrics.jsonl)."""

    def __init__(self):
        self.decode_s = 0.0
        self.wait_s = 0.0
        self.batches = 0

    def snapshot(self) -> Dict[str, float]:
        n = max(self.batches, 1)
        return {"input_decode_ms_per_batch": 1000.0 * self.decode_s / n,
                "input_wait_ms_per_batch": 1000.0 * self.wait_s / n,
                "input_batches": self.batches}


def collate(samples) -> Dict[str, np.ndarray]:
    """Stack sample dicts; non-array fields become lists."""
    out: Dict = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.integer, np.floating)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals
    return out


class Loader:
    """Iterable over batches of a dataset (see data/dataset.py)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, sampler=None, num_workers: int = 4,
                 seed: int = 0, prefetch_batches: int = 4,
                 pad_to_batch: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.sampler = sampler
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch_batches = prefetch_batches
        self.pad_to_batch = pad_to_batch
        self.shard_index = 0
        self.num_shards = 1
        self.stats = PipelineStats()

    def shard(self, shard_index: int, num_shards: int) -> "Loader":
        self.shard_index = shard_index
        self.num_shards = num_shards
        return self

    def _indices(self, rng) -> np.ndarray:
        if self.sampler is not None:
            idx = np.asarray(self.sampler.epoch_indices())
        else:
            idx = np.arange(len(self.dataset))
            if self.shuffle:
                rng.shuffle(idx)
        if self.num_shards > 1:
            idx = idx[self.shard_index::self.num_shards]
        return idx

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed)
        idx = self._indices(rng)
        n_batches = len(idx) // self.batch_size if self.drop_last \
            else -(-len(idx) // self.batch_size)

        self.dataset.reset()
        pool = ThreadPoolExecutor(self.num_workers)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        def fetch_one(i, seed):
            return self.dataset.__getitem__(
                int(i), rng=np.random.default_rng(seed))

        def producer():
            try:
                for b in range(n_batches):
                    if stop.is_set():
                        break
                    batch_idx = idx[b * self.batch_size:(b + 1) * self.batch_size]
                    seeds = rng.integers(0, 2 ** 31, size=len(batch_idx))
                    t0 = time.monotonic()
                    futs = [pool.submit(fetch_one, i, s)
                            for i, s in zip(batch_idx, seeds)]
                    batch = collate([f.result() for f in futs])
                    self.stats.decode_s += time.monotonic() - t0
                    n = len(batch_idx)
                    if self.pad_to_batch and n < self.batch_size:
                        # pad arrays by repeating the last sample; "mask"
                        # marks real entries for mask-aware eval metrics
                        pad = self.batch_size - n
                        for key, val in list(batch.items()):
                            if isinstance(val, np.ndarray):
                                batch[key] = np.concatenate(
                                    [val, np.repeat(val[-1:], pad, axis=0)])
                    if self.pad_to_batch:
                        mask = np.zeros(self.batch_size, np.float32)
                        mask[:n] = 1.0
                        batch["mask"] = mask
                    out_q.put(batch)
                out_q.put(None)
            except BaseException as exc:  # propagate to consumer
                out_q.put(exc)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                t0 = time.monotonic()
                item = out_q.get()
                self.stats.wait_s += time.monotonic() - t0
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                self.stats.batches += 1
                yield item
        finally:
            stop.set()
            pool.shutdown(wait=False, cancel_futures=True)


def device_prefetch(iterator, mesh=None, size: int = 2,
                    device_keys=("image", "target", "nuclei", "mask")):
    """Double-buffer batches onto device. Array fields in ``device_keys``
    are device_put (sharded over the mesh data axis if given); the rest stay
    host-side (tile names, slide names)."""
    import collections

    import jax

    sharding = None
    if mesh is not None:
        from ..parallel import batch_sharding

        sharding = batch_sharding(mesh)
    multiprocess = jax.process_count() > 1

    def put(batch):
        out = dict(batch)
        for key in device_keys:
            if key in out and isinstance(out[key], np.ndarray):
                if sharding is not None and multiprocess:
                    # multi-host: each process holds its disjoint loader
                    # shard; assemble the global batch (axis 0 = all hosts'
                    # rows) without any cross-host data movement — each
                    # host's rows land on its own devices
                    out[key] = jax.make_array_from_process_local_data(
                        sharding, np.ascontiguousarray(out[key]))
                elif sharding is not None:
                    out[key] = jax.device_put(out[key], sharding)
                else:
                    out[key] = jax.device_put(out[key])
        return out

    buf = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        batch = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield batch
