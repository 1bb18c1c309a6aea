"""Micro-batching inference service + HTTP front-end (monodepth_tpu.serve).

The production-serving layer the reference lacks: concurrent requests must
coalesce into device batches (shape-bucketed), results must equal direct
predict_batch, and the HTTP server must round-trip real image bytes.
"""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from monodepth_tpu.serve import DepthService, MicroBatcher


class _RecordingBackend:
    """predict_batch stand-in: records batch sizes, returns disp=mean."""

    def __init__(self):
        self.batch_sizes = []
        self.lock = threading.Lock()

    def predict_batch(self, images, metadatas=None):
        with self.lock:
            self.batch_sizes.append(len(images))
        disp = images.mean(axis=(1, 2, 3))
        return {
            "disp": disp[:, None, None] * np.ones(images.shape[1:3]),
            "depth": 1.0 / np.clip(disp[:, None, None], 1e-6, None)
            * np.ones(images.shape[1:3]),
        }


def test_microbatcher_coalesces_concurrent_requests(rng):
    backend = _RecordingBackend()
    mb = MicroBatcher(backend.predict_batch, max_batch=8, max_wait_ms=50)
    try:
        images = [rng.random((16, 20, 3), dtype=np.float32) for _ in range(8)]
        futures = [mb.submit(img) for img in images]
        results = [f.result(timeout=10) for f in futures]
        for img, res in zip(images, results):
            np.testing.assert_allclose(res["disp"][0, 0], img.mean(),
                                       rtol=1e-5)
        assert mb.served == 8
        # concurrency: strictly fewer batches than requests
        assert mb.batches < 8
        assert max(backend.batch_sizes) > 1
    finally:
        mb.close()


def test_microbatcher_shape_buckets_dont_mix(rng):
    backend = _RecordingBackend()
    mb = MicroBatcher(backend.predict_batch, max_batch=8, max_wait_ms=30)
    try:
        small = [rng.random((8, 8, 3), dtype=np.float32) for _ in range(3)]
        large = [rng.random((16, 8, 3), dtype=np.float32) for _ in range(3)]
        futures = [mb.submit(img) for pair in zip(small, large) for img in pair]
        for f in futures:
            f.result(timeout=10)
        assert mb.served == 6  # every request answered despite mixed shapes
    finally:
        mb.close()


def test_microbatcher_results_match_direct_call(rng):
    backend = _RecordingBackend()
    mb = MicroBatcher(backend.predict_batch, max_batch=4, max_wait_ms=1)
    try:
        img = rng.random((12, 10, 3), dtype=np.float32)
        got = mb.predict(img, timeout=10)
        want = backend.predict_batch(img[None])
        np.testing.assert_allclose(got["disp"], want["disp"][0])
        np.testing.assert_allclose(got["depth"], want["depth"][0])
    finally:
        mb.close()


def test_microbatcher_closed_rejects():
    backend = _RecordingBackend()
    mb = MicroBatcher(backend.predict_batch)
    mb.close()
    with pytest.raises(RuntimeError):
        mb.submit(np.zeros((4, 4, 3), np.float32))


@pytest.fixture(scope="module")
def http_service():
    """Real estimator (tiny inputs) behind the HTTP server on a free port."""
    from monodepth_tpu.cli.serve import serve_in_thread
    from monodepth_tpu.config import ModelConfig
    from monodepth_tpu.inference import MarsDepthEstimator

    estimator = MarsDepthEstimator(ModelConfig(pretrained=False))
    service = DepthService(estimator, max_batch=4, max_wait_ms=5)
    server, port = serve_in_thread(service)
    yield service, port
    server.shutdown()
    service.close()


def _png_bytes(rng, h=48, w=64):
    from PIL import Image

    arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_http_healthz_and_stats(http_service):
    _, port = http_service
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
        assert json.loads(r.read())["status"] == "ok"
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats") as r:
        stats = json.loads(r.read())
    assert {"served", "batches", "mean_batch_size"} <= set(stats)


def test_http_predict_roundtrip(http_service, rng):
    _, port = http_service
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict?source=rover&output=depth",
        data=_png_bytes(rng), method="POST",
        headers={"Content-Type": "image/png"})
    with urllib.request.urlopen(req, timeout=300) as r:
        shape = tuple(int(s) for s in
                      r.headers["X-Depth-Shape"].split(","))
        depth = np.frombuffer(r.read(), np.float32).reshape(shape)
    assert shape == (48, 64)
    assert np.isfinite(depth).all() and (depth > 0).all()


def test_http_predict_bad_body(http_service):
    _, port = http_service
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict", data=b"not an image",
        method="POST")
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        urllib.request.urlopen(req, timeout=60)
    assert exc_info.value.code == 400


def test_microbatcher_sheds_load_at_max_queue(rng):
    """Requests beyond max_queue get ServiceOverloaded immediately instead
    of queueing into a client timeout."""
    import threading

    from monodepth_tpu.serve import ServiceOverloaded

    release = threading.Event()

    def slow_predict(images, metas):
        release.wait(timeout=10)
        return {"disp": np.zeros(images.shape[:3], np.float32)}

    mb = MicroBatcher(slow_predict, max_batch=1, max_wait_ms=1, max_queue=2)
    try:
        futures = [mb.submit(rng.random((4, 4, 3), dtype=np.float32))]
        import time as _t
        _t.sleep(0.1)  # worker picks up the first request
        for _ in range(2):  # fill the queue to capacity
            futures.append(mb.submit(rng.random((4, 4, 3), dtype=np.float32)))
        with pytest.raises(ServiceOverloaded):
            mb.submit(rng.random((4, 4, 3), dtype=np.float32))
        assert mb.shed == 1
        release.set()
        for f in futures:
            assert f.result(timeout=10) is not None
    finally:
        release.set()
        mb.close()


def test_http_predict_stream_roundtrip(http_service, rng):
    """N length-prefixed images -> chunked stream of (JSON header, f32
    depth bytes) per image, in order."""
    import struct

    _, port = http_service
    blobs = [_png_bytes(np.random.default_rng(i), 24, 32) for i in range(3)]
    body = b"".join(struct.pack(">Q", len(b)) + b for b in blobs)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict_stream?source=rover&output=depth",
        data=body, method="POST",
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=300) as r:
        # urllib decodes the chunked transfer encoding transparently
        payload = r.read()
    off = 0
    for i in range(3):
        nl = payload.index(b"\n", off)
        header = json.loads(payload[off:nl])
        assert header["index"] == i
        shape = tuple(header["shape"])
        assert shape == (24, 32)
        nbytes = int(np.prod(shape)) * 4
        depth = np.frombuffer(payload[nl + 1:nl + 1 + nbytes], np.float32)
        assert np.isfinite(depth).all() and (depth > 0).all()
        off = nl + 1 + nbytes
    assert off == len(payload)


def test_serve_main_warmup_parses_and_precompiles(monkeypatch, capsys):
    """--warmup pre-compiles the listed shapes before serving starts."""
    import monodepth_tpu.cli.serve as serve_cli

    calls = []

    class _FakeEstimator:
        def __init__(self, config, seed=0, mesh=None):
            pass

        def predict_batch(self, images, metadatas=None):
            calls.append(("batch", images.shape))
            return {"disp": np.zeros(images.shape[:3], np.float32)}

        def predict(self, image, metadata=None):
            calls.append(("single", image.shape))
            return {"disp": np.zeros(image.shape[:2], np.float32)}

    class _StopServer:
        def __init__(self, *a, **k):
            raise KeyboardInterrupt  # abort before serve_forever

    monkeypatch.setattr(serve_cli, "MarsDepthEstimator", _FakeEstimator)
    monkeypatch.setattr(serve_cli, "make_server", _StopServer)
    with pytest.raises(KeyboardInterrupt):
        serve_cli.main(["--warmup", "32x48,16x16", "--max_batch", "4"])
    # every bucket size the batcher can pad to is warmed, for every shape
    for b in (1, 2, 4):
        assert ("batch", (b, 32, 48, 3)) in calls
        assert ("batch", (b, 16, 16, 3)) in calls


def test_microbatcher_pads_to_warmed_buckets(rng):
    """ADVICE r2 (medium): device batches must only ever be bucket sizes
    (1, 2, 4, ..., max_batch) — an arbitrary coalesced size would hit a cold
    jit compile and stall the worker past client timeouts."""
    backend = _RecordingBackend()
    mb = MicroBatcher(backend.predict_batch, max_batch=8, max_wait_ms=40)
    try:
        images = [rng.random((10, 12, 3), dtype=np.float32) for _ in range(3)]
        futures = [mb.submit(img) for img in images]
        results = [f.result(timeout=10) for f in futures]
        for img, res in zip(images, results):
            np.testing.assert_allclose(res["disp"][0, 0], img.mean(), rtol=1e-5)
        assert set(backend.batch_sizes) <= {1, 2, 4, 8}, backend.batch_sizes
        assert mb.served == 3  # padding rows are not counted as served
    finally:
        mb.close()


def test_bucket_sizes():
    from monodepth_tpu.serve import bucket_sizes

    assert list(bucket_sizes(8)) == [1, 2, 4, 8]
    assert list(bucket_sizes(6)) == [1, 2, 4, 6]
    assert list(bucket_sizes(1)) == [1]


def test_microbatcher_close_resolves_pending_futures(rng):
    """ADVICE r2 (low): close() must not abandon queued requests — their
    futures resolve with an error instead of blocking clients forever."""
    import threading

    release = threading.Event()

    def slow_predict(images, metas):
        release.wait(timeout=10)
        return {"disp": np.zeros(images.shape[:3], np.float32)}

    mb = MicroBatcher(slow_predict, max_batch=1, max_wait_ms=1)
    try:
        f1 = mb.submit(rng.random((8, 8, 3), dtype=np.float32))
        import time as _t
        _t.sleep(0.1)  # let the worker start on f1
        f2 = mb.submit(rng.random((8, 8, 3), dtype=np.float32))  # queued
        mb._stop.set()
        mb._queue.put(None)
        release.set()
        mb._worker.join(timeout=10)
        mb._drain([])
        assert f1.result(timeout=5) is not None  # in-flight one completes
        with pytest.raises(RuntimeError, match="closed"):
            f2.result(timeout=5)
    finally:
        release.set()


def test_http_metrics_endpoint(http_service):
    """/metrics exposes the stats counters in Prometheus text format."""
    _, port = http_service
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        body = r.read().decode()
    assert "# TYPE monodepth_served counter" in body
    for line in body.strip().splitlines():
        assert line.startswith("#") or len(line.split()) == 2
    assert any(l.startswith("monodepth_uptime_s ") for l in body.splitlines())
