#!/usr/bin/env python
"""Headline benchmark: images/sec/chip, standard model, 1024px inference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 200 — the BASELINE.json north-star target of
200 images/sec/chip at 1024px (the reference publishes no numbers of its
own, BASELINE.md).

`--all` additionally measures every BASELINE.md config (1-5) plus the
native-resolution quality mode and writes them to BENCH_CONFIGS.json
(progress on stderr; stdout stays the single headline JSON line):

  1.  standard model, single rover-style image @384 (median of 3)
  2.  batched folder inference @1024 (the headline)
  3.  enhanced model (self-attention + uncertainty)
  4.  multi-scale fusion + texture-aware refinement pass
  5.  Mars fine-tune loop (384x512, batch 8) — steps/s and img/s
  6.  native-resolution mode @1024 (4096 tokens, flash attention)
  6b. enhanced + native-resolution @1024 (spatial attention blocks)
  6c. int8 serving knob (quantize='int8'), standard @1024
  7.  HTTP serving end-to-end @512 (PNG decode -> micro-batched device
      forward -> raw f32 response, 16 concurrent clients, one host;
      median of 3)

Regression gating: per-config tolerances in TOLERANCES (noisy protocols
get wider bounds), default 15%.

Measurement protocol (see monodepth_tpu/utils/profiling.py): the remote-
execution tunnel used in this environment resolves `block_until_ready`
before device compute finishes, so per-call sync times are unreliable.
TPU programs execute in dispatch order on a single stream, therefore:
warm up, then time N pipelined dispatches followed by ONE host fetch of a
small probe slice of the final output — a data dependency that cannot
resolve until all N programs have run.  Inputs rotate across 3 pre-staged
device buffers so no result caching can apply.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

NORTH_STAR = 200.0  # images/sec/chip @1024px (BASELINE.json)


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _stage_inputs(batch, size, n=3):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    xs = [
        jax.device_put(jnp.asarray(rng.random((batch, size, size, 3),
                                               dtype=np.float32)))
        for _ in range(n)
    ]
    for x in xs:
        x.block_until_ready()
    return xs


def _pipelined_img_per_s(fwd, variables, xs, batch, repeats):
    """Warm up, then time `repeats` pipelined dispatches + one probe fetch.

    The per-sample scale vectors are pre-staged on device like the inputs:
    building a fresh `jnp.full` every dispatch is a blocking host->device
    transfer that bounds the dispatch rate for small programs (batch-1
    @384px measured 172-212 img/s with per-step transfers vs 226-247
    pre-staged — the device was 40% idle waiting on the host)."""
    import jax
    import jax.numpy as jnp

    scales = [jax.device_put(jnp.full((batch,), 1.0 + 1e-3 * i))
              for i in range(len(xs))]
    for s in scales:
        s.block_until_ready()
    for i in range(3):
        out, probe = fwd(variables, xs[i % len(xs)], scales[i % len(xs)])
        np.asarray(probe)
    t0 = time.perf_counter()
    for i in range(repeats):
        out, probe = fwd(variables, xs[i % len(xs)], scales[i % len(xs)])
    np.asarray(probe)  # in-order execution: waits for all `repeats` programs
    dt = time.perf_counter() - t0
    return repeats * batch / dt


def bench_standard(batch, size, repeats, **model_kw):
    import jax
    import jax.numpy as jnp

    from monodepth_tpu.models import DepthAnything

    model = DepthAnything(dtype=jnp.bfloat16, output_scales=(0,),
                          seq_pad_multiple=model_kw.pop("seq_pad_multiple", 16),
                          **model_kw)
    xs = _stage_inputs(batch, size)
    variables = model.init(jax.random.PRNGKey(0), xs[0][:1])

    @jax.jit
    def fwd(v, x, s):
        out = model.apply(v, x, s)[("disp", 0)]
        return out, out[:, ::256, ::256, 0]

    return _pipelined_img_per_s(fwd, variables, xs, batch, repeats)


def bench_enhanced(batch, size, repeats, **model_kw):
    import jax
    import jax.numpy as jnp

    from monodepth_tpu.models import EnhancedDepthAnything

    model = EnhancedDepthAnything(dtype=jnp.bfloat16,
                                  seq_pad_multiple=model_kw.pop(
                                      "seq_pad_multiple", 16),
                                  light_outputs=True, **model_kw)
    xs = _stage_inputs(batch, size)
    variables = model.init(jax.random.PRNGKey(0), xs[0][:1])

    @jax.jit
    def fwd(v, x, s):
        out = model.apply(v, x, s)[("disp", 0)]
        return out, out[:, ::256, ::256, 0]

    return _pipelined_img_per_s(fwd, variables, xs, batch, repeats)


def bench_fusion(batch, size, repeats):
    """Standard forward + the CLI's --multi_scale_fusion host refinement
    (models/refinement.py: hole fill + edge-preserving guided smoothing).
    Host pass included in the clock — this is the end-to-end config-4 rate."""
    import jax
    import jax.numpy as jnp

    from monodepth_tpu.models import DepthAnything
    from monodepth_tpu.models.refinement import batched_smooth, luma_guide

    model = DepthAnything(dtype=jnp.bfloat16, output_scales=(0,),
                          seq_pad_multiple=16)
    xs = _stage_inputs(batch, size)
    variables = model.init(jax.random.PRNGKey(0), xs[0][:1])
    radius = max(1, size // 16)

    # Forward + edge-preserving guided smoothing fused into ONE device
    # program: refined depth never round-trips to the host (the relay
    # transfer of [B, 1024, 1024] f32 stacks dominated the split form).
    # Hole filling is host-conditional on invalid pixels, which this path
    # cannot produce (depth = 1/clip(sigmoid-disp) is finite-positive).
    @jax.jit
    def fwd_refine(v, x, s):
        disp = model.apply(v, x, s)[("disp", 0)]
        depth = 1.0 / jnp.clip(disp[..., 0], 1e-6)
        refined = batched_smooth(depth, luma_guide(x), radius, 0.1)
        return refined[:, ::256, ::256]

    # warm-up (compile)
    probe = fwd_refine(variables, xs[0], jnp.ones((batch,)))
    np.asarray(probe)
    t0 = time.perf_counter()
    for i in range(repeats):
        probe = fwd_refine(variables, xs[i % 3], jnp.ones((batch,)))
    np.asarray(probe)
    dt = time.perf_counter() - t0
    return repeats * batch / dt


def bench_finetune(batch, height, width, steps):
    """Config 5: jitted fine-tune step rate (384x512 batch 8, the reference
    training shape, mars_finetune.py:16-61)."""
    import jax
    import jax.numpy as jnp

    from monodepth_tpu.config import ModelConfig, TrainConfig
    from monodepth_tpu.models import DepthAnything
    from monodepth_tpu.train.adapter import make_optimizer, make_train_step

    cfg = TrainConfig(model=ModelConfig(pretrained=False, dtype="bfloat16"),
                      height=height, width=width, batch_size=batch,
                      checkpoint_dir="")
    model = DepthAnything(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    images = jax.device_put(jnp.asarray(
        rng.random((batch, height, width, 3), dtype=np.float32)))
    scales = jnp.ones((batch,), jnp.float32)

    variables = model.init(jax.random.PRNGKey(0), images[:1], train=False)
    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])
    tx = make_optimizer(params, cfg, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, cfg)

    key = jax.random.PRNGKey(0)
    # warm-up (compile)
    params, stats, opt_state, losses = step(params, stats, opt_state,
                                            images, scales, key)
    np.asarray(losses["total"])
    t0 = time.perf_counter()
    for i in range(steps):
        params, stats, opt_state, losses = step(params, stats, opt_state,
                                                images, scales, key)
    np.asarray(losses["total"])  # data dependency on the final step
    dt = time.perf_counter() - t0
    return steps / dt, steps * batch / dt


# Per-config regression tolerances (VERDICT r3 weak-5): the default 15% is
# the measured shared-chip run-to-run variance of the large pipelined
# device-path configs; configs with inherently noisier protocols get their
# own bound, derived from observed cross-capture spreads:
#   - config 1 (batch-1 @384): latency-bound dispatch at the mercy of relay
#     weather; already median-of-3, still ±~20% across captures.
#   - config 7 (HTTP serving): host threads + OS scheduler + socket stack;
#     observed ~±40% single-run swings (2.3->4.4 baseline drift, 7->11.7
#     best-vs-captured).  Median-of-3 narrows it; the gate stays wide so it
#     flags collapses (e.g. batching broken -> 2 img/s), not weather.
TOLERANCES = {
    "1_single_image_384px_standard": 0.25,
    "7_http_serving_512px": 0.40,
    "7b_http_serving_512px_jpeg": 0.40,
}
DEFAULT_TOLERANCE = 0.15


def compare_results(new, old, tolerance=DEFAULT_TOLERANCE):
    """Compare two BENCH_CONFIGS.json result lists; return regressions.

    A regression is a config whose throughput dropped by more than its
    tolerance (TOLERANCES.get(config, `tolerance`)).  Configs are matched
    by their "config" key; missing configs in either list are ignored (new
    configs are not regressions).
    """
    old_by_config = {r["config"]: r for r in old if "config" in r}
    regressions = []
    for r in new:
        prev = old_by_config.get(r.get("config"))
        if not prev:
            continue
        was, now = prev.get("value"), r.get("value")
        if not was or not now:
            continue
        tol = TOLERANCES.get(r["config"], tolerance)
        if now < was * (1.0 - tol):
            regressions.append({
                "config": r["config"], "was": was, "now": now,
                "drop_pct": round(100.0 * (1.0 - now / was), 1),
                "tolerance_pct": round(100.0 * tol, 1),
            })
    return regressions


def check_regressions(results, path, tolerance=DEFAULT_TOLERANCE):
    """Compare `results` against the previous BENCH_CONFIGS.json at `path`
    (before it is overwritten).  Returns regressions; logs them loudly."""
    if not os.path.exists(path):
        return []
    try:
        with open(path) as f:
            old = json.load(f)
    except Exception as e:
        _log(f"[bench] could not read previous {path}: {e}")
        return []
    regressions = compare_results(results, old, tolerance)
    for r in regressions:
        _log(f"[bench] REGRESSION {r['config']}: {r['was']} -> {r['now']} "
             f"(-{r['drop_pct']}%, tolerance {r['tolerance_pct']:.0f}%)")
    if not regressions:
        _log(f"[bench] no regressions vs previous {path} "
             f"(default tolerance {tolerance:.0%}, per-config TOLERANCES)")
    return regressions


def _serving_payload(size, payload_format):
    """Request body for the serving bench: a REAL Mars rover frame resized
    to `size` (photo statistics — a random-noise image neither PNG- nor
    JPEG-compresses, overstating the upload wall), synthetic fallback when
    the reference corpus is absent.  Returns (bytes, description)."""
    import glob
    import io

    from PIL import Image

    paths = sorted(glob.glob("/root/reference/assets/rover/*.png"))
    if paths:
        img = Image.open(paths[0]).convert("RGB").resize(
            (size, size), Image.LANCZOS)
        desc = "real rover frame"
    else:  # pragma: no cover - env-dependent
        rng = np.random.default_rng(0)
        img = Image.fromarray(
            (rng.random((size, size, 3)) * 255).astype(np.uint8))
        desc = "synthetic frame"
    buf = io.BytesIO()
    if payload_format == "jpeg":
        img.save(buf, format="JPEG", quality=90)
    else:
        img.save(buf, format="PNG")
    data = buf.getvalue()
    return data, f"{desc}, {payload_format} {len(data) / 1e3:.0f} kB"


def bench_serving(size=512, max_batch=8, clients=16, total_requests=96,
                  estimator=None, payload_format="png"):
    """End-to-end HTTP serving throughput: image bytes in -> raw f32 depth
    out, through the micro-batched server with concurrent clients.

    Unlike configs 1-6 (device-path numbers), this is the whole production
    path on one host: HTTP parse, image decode, resize, batch coalescing +
    bucket padding, device forward, f32 serialization.  Clients hold ONE
    persistent HTTP/1.1 connection each (keep-alive — per-request TCP
    setup was pure client-side artifact).  `payload_format` 'png' or
    'jpeg' ('jpeg' ships ~10x fewer bytes for photo content; the server
    decodes both).  `estimator=None` builds the real bf16 standard model
    (tests inject a stub).  Returns (images/sec, service stats dict).
    """
    import http.client
    import threading

    from monodepth_tpu.cli.serve import serve_in_thread
    from monodepth_tpu.serve import DepthService

    if estimator is None:
        from monodepth_tpu.config import ModelConfig
        from monodepth_tpu.inference import MarsDepthEstimator

        # host_upsample matches the serve CLI default: the device returns
        # the decoder-resolution map and the host upsamples (the full-res
        # fetch through the tunnel bounded the old end-to-end number)
        estimator = MarsDepthEstimator(
            ModelConfig(dtype="bfloat16", pretrained=False,
                        use_default_checkpoint=False, host_upsample=True))
    service = DepthService(estimator, max_batch=max_batch)
    # Warm every bucket shape the batcher can send to the device (the
    # serve CLI's --warmup does the same) so no timed request compiles.
    for b in reversed(service.batcher._buckets):
        # uint8 like real decoded requests (device-side normalize program)
        estimator.predict_batch(np.zeros((b, size, size, 3), np.uint8))
    server, port = serve_in_thread(service, model_desc="bench")
    try:
        payload, payload_desc = _serving_payload(size, payload_format)
        _log(f"[bench serving] payload: {payload_desc}")
        path_qs = f"/predict?source=rover&max_size={size}"

        def post_n(n):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            try:
                for _ in range(n):
                    conn.request("POST", path_qs, body=payload)
                    r = conn.getresponse()
                    r.read()
                    if r.status != 200:
                        raise RuntimeError(f"HTTP {r.status}")
            finally:
                conn.close()

        post_n(2)  # HTTP-path warmup (device shapes are already compiled)
        per = max(total_requests // clients, 1)
        errors = []

        def client():
            try:
                post_n(per)
            except Exception as e:  # surfaced after join — a silently
                errors.append(e)    # dead thread would inflate img/s

        threads = [threading.Thread(target=client) for _ in range(clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        if errors:
            raise RuntimeError(
                f"{len(errors)}/{clients} serving-bench clients failed; "
                f"first: {errors[0]!r}")
        stats = service.stats()
    finally:
        server.shutdown()
        service.close()
    return clients * per / dt, stats


def run_all(headline_value, batch, size, repeats):
    results = [
        {"config": "2_batched_folder_1024px_standard",
         "metric": "images/sec/chip, standard bf16, 1024px, batch 32",
         "value": round(headline_value, 2), "unit": "images/sec/chip",
         "vs_baseline": round(headline_value / NORTH_STAR, 3)},
    ]

    _log("[bench --all] config 1: standard @384, batch 1 ...")
    # latency-bound batch-1 dispatch is at the mercy of relay weather
    # (observed 172-247 img/s across identical runs); report the median of
    # three independent measurements instead of one draw
    v = float(np.median([bench_standard(1, 384, max(repeats, 30))
                         for _ in range(3)]))
    results.append({
        "config": "1_single_image_384px_standard",
        "metric": "images/sec/chip, standard bf16, 384px, batch 1",
        "value": round(v, 2), "unit": "images/sec/chip",
        "vs_baseline": round(v / NORTH_STAR, 3)})

    _log("[bench --all] config 3: enhanced @1024, batch 16 ...")
    v = bench_enhanced(16, size, repeats)
    results.append({
        "config": "3_enhanced_1024px",
        "metric": "images/sec/chip, enhanced bf16 (attention+uncertainty), 1024px, batch 16",
        "value": round(v, 2), "unit": "images/sec/chip",
        "vs_baseline": round(v / NORTH_STAR, 3)})

    _log("[bench --all] config 4: fusion+refinement @1024, batch 8 ...")
    v = bench_fusion(8, size, max(repeats // 6, 3))
    results.append({
        "config": "4_multi_scale_fusion_refinement_1024px",
        "metric": "images/sec/chip, standard + fused on-device guided-filter refinement, 1024px, batch 8",
        "value": round(v, 2), "unit": "images/sec",
        "vs_baseline": round(v / NORTH_STAR, 3)})

    _log("[bench --all] config 5: fine-tune loop 384x512 batch 8 ...")
    steps_s, img_s = bench_finetune(8, 384, 512, steps=20)
    results.append({
        "config": "5_finetune_loop_384x512_b8",
        "metric": "train steps/sec (and img/s), standard bf16, 384x512, batch 8",
        "value": round(steps_s, 3), "unit": "steps/sec",
        "images_per_sec": round(img_s, 2),
        "vs_baseline": None})

    _log("[bench --all] config 6: native-resolution mode @1024, batch 8 ...")
    try:
        # mlp_impl pinned to the historical exact-erf variant so this row
        # stays comparable across rounds; the SHIPPED default for native
        # serving is 'auto' -> 'xla_tanh' since round 5 — that's row 6d.
        v = bench_standard(8, size, max(repeats // 3, 5),
                           native_patching=True, attn_impl="pallas",
                           attn_window=int(os.environ.get(
                               "MONODEPTH_BENCH_NATIVE_WINDOW", "16")),
                           seq_pad_multiple=1, mlp_impl="xla")
        results.append({
            "config": "6_native_resolution_1024px",
            "metric": "images/sec/chip, native-resolution bf16 (4096 tokens, window 16, exact-erf GELU), 1024px, batch 8",
            "value": round(v, 2), "unit": "images/sec/chip",
            "vs_baseline": round(v / NORTH_STAR, 3)})
    except Exception as e:  # pragma: no cover - env-dependent
        _log(f"[bench --all] native mode failed: {e}")

    _log("[bench --all] config 6d: native mode + tanh-GELU MLP @1024, batch 8 ...")
    try:
        # The exact-erf GELU VPU pass is the native tower's largest
        # recoverable elementwise cost (tower 51.9 -> 32.1 ms with tanh,
        # round-5 on-chip probe under the trained v2 weights).  Since
        # round 5 this IS the shipped default for native bf16 serving
        # (ModelConfig.mlp_impl='auto'): the measured deviation from f32
        # truth (2.38e-3 max rel) matches the bf16 rounding that path
        # already accepts (2.34e-3).  Config 6 keeps the exact-erf
        # variant for cross-round comparability.
        v = bench_standard(8, size, max(repeats // 3, 5),
                           native_patching=True, attn_impl="pallas",
                           attn_window=16, seq_pad_multiple=1,
                           mlp_impl=os.environ.get(
                               "MONODEPTH_BENCH_MLP_IMPL", "xla_tanh"))
        results.append({
            "config": "6d_native_tanh_gelu_1024px",
            "metric": "images/sec/chip, native-resolution bf16 + tanh-GELU "
                      "MLP knob (mlp_impl='xla_tanh'), 1024px, batch 8",
            "value": round(v, 2), "unit": "images/sec/chip",
            "vs_baseline": round(v / NORTH_STAR, 3)})
    except Exception as e:  # pragma: no cover - env-dependent
        _log(f"[bench --all] native tanh-GELU mode failed: {e}")

    _log("[bench --all] config 6b: enhanced + native-resolution @1024, batch 4 ...")
    try:
        v = bench_enhanced(4, size, max(repeats // 3, 5),
                           native_patching=True, attn_impl="pallas",
                           attn_window=16, seq_pad_multiple=1)
        results.append({
            "config": "6b_enhanced_native_1024px",
            "metric": "images/sec/chip, enhanced native-resolution bf16 "
                      "(4096 tokens, window 16, spatial attention blocks), "
                      "1024px, batch 4",
            "value": round(v, 2), "unit": "images/sec/chip",
            "vs_baseline": round(v / NORTH_STAR, 3)})
    except Exception as e:  # pragma: no cover - env-dependent
        _log(f"[bench --all] enhanced-native mode failed: {e}")

    _log("[bench --all] config 6c: int8 serving knob, standard @1024, batch 32 ...")
    try:
        v = bench_standard(batch, size, repeats, quantize="int8")
        results.append({
            "config": "6c_int8_1024px",
            "metric": "images/sec/chip, standard int8-quantized ViT matmuls "
                      "(serving knob, ModelConfig.quantize='int8'), 1024px, "
                      "batch 32",
            "value": round(v, 2), "unit": "images/sec/chip",
            "vs_baseline": round(v / NORTH_STAR, 3)})
    except Exception as e:  # pragma: no cover - env-dependent
        _log(f"[bench --all] int8 mode failed: {e}")

    _log("[bench --all] config 7: HTTP serving end-to-end @512, 16 clients, "
         "median of 3 ...")
    try:
        # median-of-3 (VERDICT r3 weak-1): the serving number's run-to-run
        # variance dwarfs a single draw.  One estimator serves all three
        # runs so device programs compile once and the repeats time only
        # the serving path.
        from monodepth_tpu.config import ModelConfig
        from monodepth_tpu.inference import MarsDepthEstimator

        est = MarsDepthEstimator(ModelConfig(
            dtype="bfloat16", pretrained=False, use_default_checkpoint=False,
            host_upsample=True))
        for fmt, config_name in (("png", "7_http_serving_512px"),
                                 ("jpeg", "7b_http_serving_512px_jpeg")):
            runs, stats_runs = [], []
            for _ in range(3):
                v, stats = bench_serving(estimator=est, payload_format=fmt)
                runs.append(v)
                stats_runs.append(stats)
            order = int(np.argsort(runs)[len(runs) // 2])
            v, stats = runs[order], stats_runs[order]
            _log(f"[bench --all] serving runs ({fmt}): "
                 f"{[round(r, 2) for r in runs]} -> median {v:.2f}")
            results.append({
                "config": config_name,
                "metric": f"images/sec end-to-end, micro-batched HTTP "
                          f"serving ({fmt} upload of a real rover frame + "
                          f"decode + batch coalescing + device + f32 "
                          f"response), 512px, 16 keep-alive clients, "
                          f"1 host, median of 3 runs",
                "value": round(v, 2), "unit": "images/sec",
                "runs": [round(r, 2) for r in sorted(runs)],
                "mean_batch_size": stats.get("mean_batch_size"),
                "vs_baseline": None})
    except Exception as e:  # pragma: no cover - env-dependent
        _log(f"[bench --all] serving bench failed: {e}")

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_CONFIGS.json")
    regressions = check_regressions(results, path)
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    _log(f"[bench --all] wrote {path}")
    if regressions and os.environ.get("MONODEPTH_BENCH_STRICT"):
        raise SystemExit(f"{len(regressions)} perf regression(s) > 15%")


def main() -> int:
    # measured on v5e: b8 1340, b16 1819, b32 1864, b64 1920 img/s; 32 is
    # the knee of the curve with comfortable HBM headroom.
    args = [a for a in sys.argv[1:] if a != "--all"]
    run_all_configs = "--all" in sys.argv[1:] or os.environ.get("MONODEPTH_BENCH_ALL")
    batch = int(float(args[0])) if args else 32
    # size/repeats overridable for CI smoke runs on CPU (test_bench_smoke).
    size = int(os.environ.get("MONODEPTH_BENCH_SIZE", 1024))
    repeats = int(os.environ.get("MONODEPTH_BENCH_REPEATS", 30))

    # seq_pad_multiple=16: 197 tokens -> 208 (MXU tiles), +19% measured.
    value = bench_standard(batch, size, repeats)

    if run_all_configs:
        run_all(value, batch, size, repeats)

    print(json.dumps({
        "metric": "images/sec/chip, standard model bf16, 1024px inference",
        "value": round(value, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / NORTH_STAR, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
