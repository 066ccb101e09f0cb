"""Online serving daemon: micro-batcher semantics + HTTP round trip.

The reference has no serving surface (SURVEY.md §2.2: its only inference
path is Trainer.predict over a CSV); these tests pin the new daemon's
contract: coalescing into fixed-shape batches, deadline flush, error
fan-out, and the uint8 wire codec matching the direct forward.
"""

import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from mipheivit_tpu.infer.serve import MicroBatcher, TileServer

pytestmark = pytest.mark.tier0

TILE = 16


def _echo_fwd(x):
    """Deterministic stand-in forward: uint8 [B,H,W,3] -> uint8 [B,H,W,2]."""
    x = x.astype(np.float32)
    out = np.stack([x.mean(-1), x.max(-1)], axis=-1)
    return np.clip(out, 0, 255).astype(np.uint8)


def test_microbatcher_results_match_direct():
    mb = MicroBatcher(_echo_fwd, batch_size=4, item_shape=(TILE, TILE, 3),
                      max_delay_ms=10)
    try:
        rng = np.random.default_rng(0)
        tiles = rng.integers(0, 256, (9, TILE, TILE, 3), np.uint8)
        futs = [mb.submit(t) for t in tiles]
        got = np.stack([f.result(timeout=30) for f in futs])
        np.testing.assert_array_equal(got, _echo_fwd(tiles))
        st = mb.stats()
        assert st["n_requests"] == 9
        # 9 requests at batch 4 coalesce into at most 9 (worst-case solo
        # flushes) and at least 3 executions
        assert 3 <= st["n_batches"] <= 9
        assert "latency_ms_p50" in st
    finally:
        mb.stop()


def test_microbatcher_coalesces_concurrent_load():
    """Under a held-open gate, all concurrently queued requests land in the
    minimum number of batches."""
    gate = threading.Event()
    calls = []

    def slow_fwd(x):
        gate.wait(5)
        calls.append(x.shape[0])
        return _echo_fwd(x)

    mb = MicroBatcher(slow_fwd, batch_size=4, item_shape=(TILE, TILE, 3),
                      max_delay_ms=200)
    try:
        tiles = np.zeros((8, TILE, TILE, 3), np.uint8)
        futs = [mb.submit(t) for t in tiles]
        gate.set()
        for f in futs:
            f.result(timeout=30)
        # first batch may be ragged (the worker grabs whatever arrived before
        # its deadline), but 8 requests must not take more than 3 executions
        assert mb.stats()["n_batches"] <= 3
    finally:
        mb.stop()


def test_microbatcher_deadline_flush():
    mb = MicroBatcher(_echo_fwd, batch_size=64, item_shape=(TILE, TILE, 3),
                      max_delay_ms=20)
    try:
        t0 = time.perf_counter()
        fut = mb.submit(np.zeros((TILE, TILE, 3), np.uint8))
        fut.result(timeout=30)
        # a lone request must not wait for the batch to fill
        assert time.perf_counter() - t0 < 5.0
        assert mb.stats()["n_padded_rows"] >= 63
    finally:
        mb.stop()


def test_microbatcher_rejects_bad_shape_and_propagates_errors():
    def boom(x):
        raise RuntimeError("device on fire")

    mb = MicroBatcher(boom, batch_size=2, item_shape=(TILE, TILE, 3),
                      max_delay_ms=5)
    try:
        with pytest.raises(ValueError, match="expected"):
            mb.submit(np.zeros((TILE, TILE), np.uint8))
        fut = mb.submit(np.zeros((TILE, TILE, 3), np.uint8))
        with pytest.raises(RuntimeError, match="device on fire"):
            fut.result(timeout=30)
        # the worker must survive a failing forward
        fut2 = mb.submit(np.zeros((TILE, TILE, 3), np.uint8))
        with pytest.raises(RuntimeError):
            fut2.result(timeout=30)
    finally:
        mb.stop()


@pytest.fixture
def server():
    srv = TileServer(_echo_fwd, tile_size=TILE, batch_size=4,
                     channel_names=["mean", "max"], max_delay_ms=5, port=0)
    srv.start()
    yield srv
    srv.stop()


def _post_npy(url: str, arr: np.ndarray):
    buf = io.BytesIO()
    np.save(buf, arr)
    req = urllib.request.Request(url, data=buf.getvalue(),
                                 headers={"Content-Type": "application/x-npy"})
    return urllib.request.urlopen(req, timeout=30)


def test_http_predict_roundtrip(server):
    base = f"http://{server.host}:{server.port}"
    with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
        assert json.loads(r.read())["status"] == "ok"

    rng = np.random.default_rng(1)
    tile = rng.integers(0, 256, (TILE, TILE, 3), np.uint8)
    with _post_npy(base + "/v1/predict", tile) as r:
        assert r.headers["Content-Type"] == "application/x-npy"
        assert r.headers["X-Markers"] == "mean,max"
        pred = np.load(io.BytesIO(r.read()))
    assert pred.shape == (TILE, TILE, 2) and pred.dtype == np.uint8
    np.testing.assert_array_equal(pred, _echo_fwd(tile[None])[0])

    batch = rng.integers(0, 256, (3, TILE, TILE, 3), np.uint8)
    with _post_npy(base + "/v1/predict", batch) as r:
        preds = np.load(io.BytesIO(r.read()))
    np.testing.assert_array_equal(preds, _echo_fwd(batch))

    with urllib.request.urlopen(base + "/stats", timeout=10) as r:
        st = json.loads(r.read())
    assert st["n_requests"] == 4


def test_http_rejects_bad_input(server):
    base = f"http://{server.host}:{server.port}"
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post_npy(base + "/v1/predict",
                  np.zeros((TILE, TILE, 3), np.float32))
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post_npy(base + "/v1/predict",
                  np.zeros((TILE + 1, TILE + 1, 3), np.uint8))
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        req = urllib.request.Request(base + "/v1/predict", data=b"not npy")
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 400


def test_http_concurrent_clients(server):
    """Many client threads hammering one server: every response correct,
    and the batcher coalesced (occupancy above solo-dispatch)."""
    base = f"http://{server.host}:{server.port}"
    rng = np.random.default_rng(2)
    tiles = rng.integers(0, 256, (16, TILE, TILE, 3), np.uint8)
    results = [None] * len(tiles)
    errors = []

    def client(i):
        try:
            with _post_npy(base + "/v1/predict", tiles[i]) as r:
                results[i] = np.load(io.BytesIO(r.read()))
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(len(tiles))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors
    expect = _echo_fwd(tiles)
    for i in range(len(tiles)):
        np.testing.assert_array_equal(results[i], expect[i])


def test_serving_fn_matches_reference_codec():
    """build_serving_fn's device-side uint8 codec == host-side
    predictions_to_uint8 of the raw forward, and the H&E affine matches the
    host Normalizer."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from mipheivit_tpu.data.stats import Normalizer
    from mipheivit_tpu.infer.serve import build_serving_fn
    from mipheivit_tpu.infer.tiles import predictions_to_uint8

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.tanh(nn.Conv(2, (3, 3))(x)) * 0.9

    model = Tiny()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, TILE, TILE, 3)))
    norm = Normalizer({"mean": [180.0, 120.0, 160.0],
                       "std": [50.0, 40.0, 45.0]}, mode="he")
    fwd_np = build_serving_fn(model, params, norm, TILE, batch_size=2)

    rng = np.random.default_rng(3)
    x = rng.integers(0, 256, (2, TILE, TILE, 3), np.uint8)
    got = fwd_np(x)
    ref = predictions_to_uint8(np.asarray(
        model.apply(params, jnp.asarray(norm(x.astype(np.float32))))))
    # device rint vs host truncate-after-clip: allow the 1-LSB rounding step
    assert got.dtype == np.uint8
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_serving_fn_mesh_matches_single_device():
    """dp-sharded serving fn (8-device CPU mesh) == unsharded output."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from mipheivit_tpu.data.stats import Normalizer
    from mipheivit_tpu.infer.serve import build_serving_fn
    from mipheivit_tpu.parallel import make_data_mesh

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.tanh(nn.Conv(2, (3, 3))(x)) * 0.9

    model = Tiny()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, TILE, TILE, 3)))
    norm = Normalizer({"mean": [180.0, 120.0, 160.0],
                       "std": [50.0, 40.0, 45.0]}, mode="he")
    fwd_solo = build_serving_fn(model, params, norm, TILE, batch_size=8)
    fwd_mesh = build_serving_fn(model, params, norm, TILE, batch_size=8,
                                mesh=make_data_mesh(8))
    rng = np.random.default_rng(4)
    x = rng.integers(0, 256, (8, TILE, TILE, 3), np.uint8)
    np.testing.assert_array_equal(fwd_mesh(x), fwd_solo(x))
