"""HTTP depth-estimation server (stdlib-only, micro-batched).

A production-serving front-end the reference lacks entirely: concurrent
clients POST images, the service coalesces them into device batches
(monodepth_tpu.serve.MicroBatcher), and throughput approaches the batched
bench numbers instead of the single-image rate.

Endpoints:
  GET  /healthz          -> {"status": "ok", "model": ...}
  GET  /stats            -> request/batch/queue counters
  POST /predict          -> raw float32 depth map bytes (C-order) with
                            shape in the X-Depth-Shape header.
       body: PNG/JPEG image bytes
       query params: source=auto|rover|ingenuity|satellite,
                     max_size=<int> (LANCZOS downscale bound, default 1024),
                     output=depth|disp (default depth)
  POST /predict_stream   -> chunked streaming over MANY images (video /
       sequence serving): body is N images, each prefixed with its byte
       length as an 8-byte big-endian u64; the response streams, per
       image and in order, one JSON header line
       ({"index", "shape", "dtype"}\n) followed by the raw float32 depth
       bytes — each result is flushed as soon as its micro-batch
       completes, so the client overlaps decode/network with device
       compute.  Same query params as /predict.
  Overload: when the request queue is at capacity the server sheds load
  with 503 + Retry-After instead of queueing into client timeouts.

Usage:
  python -m monodepth_tpu.cli.serve --port 8500 --dtype bfloat16 \
      [--enhanced_model] [--native_resolution] [--max_batch 8]
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from monodepth_tpu.config import ModelConfig
from monodepth_tpu.inference import MarsDepthEstimator
from monodepth_tpu.serve import DepthService, ServiceOverloaded

__all__ = ["make_server", "main"]


def _decode_image(data: bytes, max_size: int,
                  fixed_shape=None) -> np.ndarray:
    from PIL import Image

    img = Image.open(io.BytesIO(data)).convert("RGB")
    if fixed_shape is not None:
        # artifact serving: the program is traced at one HxW, so the server
        # owns the resize to that contract (clients send any image)
        h, w = fixed_shape
        if img.size != (w, h):
            img = img.resize((w, h), Image.LANCZOS)
    elif max_size and max(img.size) > max_size:
        scale = max_size / max(img.size)
        img = img.resize((int(img.size[0] * scale), int(img.size[1] * scale)),
                         Image.LANCZOS)
    # stay uint8: the estimator normalizes ON DEVICE (u8 -> f32/255 inside
    # jit, within a f32 ULP of the host division) so the host->device upload
    # ships 1 byte/channel instead of 4 — after the host-upsample fix the
    # f32 image upload was the serving pipeline's largest remaining transfer
    return np.asarray(img, dtype=np.uint8)


def make_server(service: DepthService, host: str = "127.0.0.1",
                port: int = 8500, model_desc: str = "standard",
                fixed_shape=None):
    class Handler(BaseHTTPRequestHandler):
        # chunked transfer (our /predict_stream framing) is only defined for
        # HTTP/1.1; the BaseHTTPRequestHandler default of 1.0 would make
        # strict clients read raw chunk framing as payload
        protocol_version = "HTTP/1.1"

        def log_message(self, *args):  # quiet by default
            pass

        def _json(self, code: int, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/healthz":
                self._json(200, {"status": "ok", "model": model_desc})
            elif path == "/stats":
                self._json(200, service.stats())
            elif path == "/metrics":
                # Prometheus text exposition format of the /stats counters
                stats = service.stats()
                lines = []
                for key, mtype in (("served", "counter"),
                                   ("batches", "counter"),
                                   ("padded_rows", "counter"),
                                   ("shed", "counter"),
                                   ("queue_depth", "gauge"),
                                   ("mean_batch_size", "gauge"),
                                   ("uptime_s", "gauge")):
                    name = f"monodepth_{key}"
                    lines.append(f"# TYPE {name} {mtype}")
                    lines.append(f"{name} {stats[key]}")
                body = ("\n".join(lines) + "\n").encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(404, {"error": f"unknown path {path}"})

        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path == "/predict_stream":
                self._predict_stream(parsed)
                return
            if parsed.path != "/predict":
                self._json(404, {"error": f"unknown path {parsed.path}"})
                return
            qs = parse_qs(parsed.query)
            source = qs.get("source", ["auto"])[0]
            try:
                max_size = int(qs.get("max_size", ["1024"])[0])
            except ValueError:
                self._json(400, {"error": "max_size must be an integer"})
                return
            output = qs.get("output", ["depth"])[0]
            if output not in ("depth", "disp"):
                self._json(400, {"error": f"bad output {output!r}"})
                return
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0:
                self._json(400, {"error": "empty body"})
                return
            try:
                image = _decode_image(self.rfile.read(length), max_size,
                                      fixed_shape)
            except Exception as e:
                self._json(400, {"error": f"bad image: {e}"})
                return
            metadata = None if source == "auto" else {"source": source}
            try:
                result = service.predict(image, metadata, timeout=120)
            except ServiceOverloaded as e:
                self.send_response(503)
                self.send_header("Retry-After", "1")
                body = json.dumps({"error": str(e)}).encode()
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            except ValueError as e:
                # contract violations (e.g. artifact input shape) are the
                # client's error, not a server failure
                self._json(400, {"error": str(e)})
                return
            except Exception as e:  # pragma: no cover - device failures
                self._json(500, {"error": str(e)})
                return
            arr = np.ascontiguousarray(result[output], dtype=np.float32)
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("X-Depth-Shape",
                             ",".join(map(str, arr.shape)))
            self.send_header("X-Depth-Dtype", "float32")
            self.send_header("Content-Length", str(arr.nbytes))
            self.end_headers()
            self.wfile.write(arr.tobytes())

        # ---------------------------------------------------- streaming
        def _chunk(self, data: bytes):
            self.wfile.write(f"{len(data):X}\r\n".encode())
            self.wfile.write(data)
            self.wfile.write(b"\r\n")
            self.wfile.flush()

        def _predict_stream(self, parsed):
            """N length-prefixed images in -> chunked per-image results out,
            each flushed the moment its micro-batch completes (the futures
            for all images are submitted up front, so the device batches
            across the whole sequence)."""
            import struct

            qs = parse_qs(parsed.query)
            source = qs.get("source", ["auto"])[0]
            try:
                max_size = int(qs.get("max_size", ["1024"])[0])
            except ValueError:
                self._json(400, {"error": "max_size must be an integer"})
                return
            output = qs.get("output", ["depth"])[0]
            if output not in ("depth", "disp"):
                self._json(400, {"error": f"bad output {output!r}"})
                return
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            images, off = [], 0
            try:
                while off < len(body):
                    (n,) = struct.unpack(">Q", body[off:off + 8])
                    off += 8
                    images.append(_decode_image(body[off:off + n], max_size,
                                                fixed_shape))
                    off += n
            except Exception as e:
                self._json(400, {"error": f"bad stream body: {e}"})
                return
            if not images:
                self._json(400, {"error": "empty stream"})
                return
            metadata = None if source == "auto" else {"source": source}
            futures, overloaded = [], None
            for img in images:
                try:
                    futures.append(service.submit(img, metadata))
                except ServiceOverloaded as e:
                    # keep the work already accepted (the device computes it
                    # anyway); stream those results and per-image 'overloaded'
                    # errors for the remainder instead of wasting the batch
                    overloaded = str(e)
                    break
            if not futures:
                self.send_response(503)
                self.send_header("Retry-After", "1")
                b = json.dumps({"error": overloaded}).encode()
                self.send_header("Content-Length", str(len(b)))
                self.end_headers()
                self.wfile.write(b)
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            for i, fut in enumerate(futures):
                try:
                    arr = np.ascontiguousarray(
                        fut.result(timeout=120)[output], dtype=np.float32)
                    header = json.dumps({"index": i,
                                         "shape": list(arr.shape),
                                         "dtype": "float32"})
                    self._chunk(header.encode() + b"\n")
                    self._chunk(arr.tobytes())
                except Exception as e:  # pragma: no cover - device failures
                    self._chunk(json.dumps(
                        {"index": i, "error": str(e)}).encode() + b"\n")
            for i in range(len(futures), len(images)):
                self._chunk(json.dumps(
                    {"index": i, "error": f"overloaded: {overloaded}",
                     "retry": True}).encode() + b"\n")
            self._chunk(b"")  # terminating chunk

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Mars depth HTTP server")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--enhanced_model", action="store_true")
    p.add_argument("--native_resolution", action="store_true")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--quantize", default="", choices=["", "int8"],
                   help="int8: ViT matmuls on the quantized MXU path "
                        "(accuracy bounds: tests/test_quant.py; real-asset "
                        "agreement r=0.986 vs bf16, docs/PERF_STUDY.md)")
    p.add_argument("--vit", default="base",
                   choices=["small", "base", "large"],
                   help="ViT backbone size (base = reference parity)")
    p.add_argument("--mesh", default="",
                   help="shard device batches over a mesh: 'auto' (all "
                        "local chips, data-parallel) or 'data=N[,model=M]' "
                        "(Megatron TP over the ViT projections); outputs "
                        "are numerically identical to single-device")
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    p.add_argument("--max_queue", type=int, default=256,
                   help="shed load (503 + Retry-After) when this many "
                        "requests are already queued")
    p.add_argument("--artifact", default=None,
                   help="serve a frozen AOT artifact dir (cli.export_model) "
                        "instead of tracing the installed model code: the "
                        "device runs the pinned StableHLO program; weights "
                        "still load via --checkpoint.  Clients must send "
                        "images matching the artifact's traced HxW")
    p.add_argument("--warmup", default="",
                   help="comma-separated HxW shapes to pre-compile at "
                        "startup (e.g. '288x512,512x512') so the first "
                        "request per shape does not pay the ~60-90 s "
                        "remote compile")
    p.add_argument("--no_host_upsample", action="store_true",
                   help="fetch the full-resolution depth from the device "
                        "instead of upsampling the decoder-resolution map "
                        "on host.  Host upsample (the default) ships ~300x "
                        "fewer device->host bytes — the serving bottleneck "
                        "through a tunneled runtime — and is at least as "
                        "precise (f32 host resample of the same two-tap "
                        "tables vs the device's bf16 resize); response "
                        "format is unchanged")
    args = p.parse_args(argv)

    config = ModelConfig(enhanced=args.enhanced_model, dtype=args.dtype,
                         vit_variant=args.vit,
                         checkpoint=args.checkpoint,
                         native_patching=args.native_resolution,
                         # frozen artifacts carry their own (full-res)
                         # output program; host upsample needs the live model
                         host_upsample=(not args.no_host_upsample
                                        and not args.artifact),
                         quantize=args.quantize)
    # With --artifact the frozen program carries its own device placement;
    # mesh-sharding the weight arrays would only add a reshard on the hot
    # path, so the estimator is built unsharded in that case.
    estimator = MarsDepthEstimator(config,
                                   mesh=None if args.artifact else args.mesh)
    fixed_shape = None
    if args.artifact:
        if args.mesh:
            print("--mesh ignored with --artifact (the frozen program "
                  "carries its own device placement)")
        from monodepth_tpu.export import ArtifactDepthEstimator

        # frozen program; the live estimator only supplies the weights
        backend = ArtifactDepthEstimator(args.artifact, estimator.variables)
        fixed_shape = (backend.height, backend.width)
        if args.warmup:
            print(f"--warmup {args.warmup!r} ignored: the artifact is traced "
                  f"at exactly {backend.height}x{backend.width}")
        warmup_shapes = [fixed_shape]
        buckets = None
        if backend.fixed_batch is not None:
            # fixed-batch program: pad EVERY device batch to exactly it
            if args.max_batch != backend.fixed_batch:
                print(f"--max_batch {args.max_batch} overridden to the "
                      f"artifact's fixed batch {backend.fixed_batch}")
            args.max_batch = backend.fixed_batch
            buckets = [backend.fixed_batch]
        print(f"artifact serving: inputs are resized server-side to "
              f"{backend.height}x{backend.width} (the traced contract)")
    else:
        backend = estimator
        warmup_shapes = [tuple(int(d) for d in s.lower().split("x"))
                         for s in filter(None, args.warmup.split(","))]
        buckets = None
    service = DepthService(backend, max_batch=args.max_batch,
                           max_wait_ms=args.max_wait_ms,
                           max_queue=args.max_queue, buckets=buckets)
    # live requests arrive as uint8 (device-side normalize); the artifact
    # program is traced f32 and host-converts, so either dtype warms it
    warm_dtype = np.float32 if args.artifact else np.uint8
    for h, w in warmup_shapes:
        # warm every bucket the MicroBatcher can pad to — it only ever sends
        # these sizes to the device, so no live request pays a cold compile
        for b in reversed(service.batcher._buckets):
            print(f"warmup {h}x{w} batch {b} ...", flush=True)
            backend.predict_batch(np.zeros((b, h, w, 3), warm_dtype))
    desc = ("enhanced" if args.enhanced_model else "standard") + \
        ("/native" if args.native_resolution else "") + f"/{args.dtype}" + \
        ("/int8" if args.quantize else "") + \
        ("/artifact" if args.artifact else "")
    server = make_server(service, args.host, args.port, model_desc=desc,
                         fixed_shape=fixed_shape)
    print(f"Serving {desc} on http://{args.host}:{args.port} "
          f"(max_batch={args.max_batch}, wait={args.max_wait_ms}ms)")
    # Graceful SIGTERM (k8s/pod preemption): finish in-flight batches,
    # resolve pending futures with 'service closed', release the port.
    import signal

    def _sigterm(signum, frame):  # pragma: no cover - signal path
        raise KeyboardInterrupt

    try:
        signal.signal(signal.SIGTERM, _sigterm)
    except ValueError:  # pragma: no cover - non-main thread (tests)
        pass
    try:
        server.serve_forever()
    except KeyboardInterrupt:  # pragma: no cover
        pass
    finally:
        service.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())


def serve_in_thread(service: DepthService, host: str = "127.0.0.1",
                    port: int = 0, model_desc: str = "test"):
    """Start the server on a background thread (tests); returns
    (server, actual_port)."""
    server = make_server(service, host, port, model_desc=model_desc)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, server.server_address[1]
