"""Driver-entry-point smoke tests: bench.py emits its JSON contract."""

import json
import os
import subprocess
import sys


def test_bench_emits_json_line():
    """`python bench.py <batch>` prints exactly one JSON line with the
    driver-required keys (run tiny on CPU)."""
    env = dict(os.environ)
    env.update({
        "MONODEPTH_BENCH_SIZE": "64",
        "MONODEPTH_BENCH_REPEATS": "2",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "MONODEPTH_TEST_FORCE_CPU": "1",
    })
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Force CPU inside the child the same way conftest does.
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import runpy, sys; sys.argv = ['bench.py', '1'];"
        f"runpy.run_path({os.path.join(repo, 'bench.py')!r}, run_name='__main__')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, cwd=repo, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, proc.stdout
    payload = json.loads(lines[0])
    assert set(payload) == {"metric", "value", "unit", "vs_baseline"}
    assert payload["value"] > 0
    assert payload["unit"] == "images/sec/chip"


def test_bench_regression_comparison(tmp_path):
    """VERDICT r2 item 8: comparing a new BENCH_CONFIGS capture against the
    previous round's flags >15% drops and ignores noise/new configs."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    old = [
        {"config": "a", "value": 100.0},
        {"config": "b", "value": 200.0},
        {"config": "gone", "value": 50.0},
    ]
    new = [
        {"config": "a", "value": 90.0},     # -10%: within tolerance
        {"config": "b", "value": 150.0},    # -25%: regression
        {"config": "new_cfg", "value": 5.0},  # new: ignored
    ]
    regs = bench.compare_results(new, old, tolerance=0.15)
    assert [r["config"] for r in regs] == ["b"]
    assert regs[0]["was"] == 200.0 and regs[0]["now"] == 150.0
    assert regs[0]["drop_pct"] == 25.0

    # check_regressions end-to-end against a file (and survives bad files)
    path = tmp_path / "BENCH_CONFIGS.json"
    path.write_text(json.dumps(old))
    regs2 = bench.check_regressions(new, str(path))
    assert [r["config"] for r in regs2] == ["b"]
    assert bench.check_regressions(new, str(tmp_path / "missing.json")) == []
    (tmp_path / "bad.json").write_text("not json")
    assert bench.check_regressions(new, str(tmp_path / "bad.json")) == []


def test_bench_serving_end_to_end_with_stub():
    """bench_serving drives the real HTTP server + MicroBatcher path with a
    stub device model: requests coalesce into batches, throughput > 0."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    calls = []

    class _Stub:
        def predict_batch(self, images, metadatas=None):
            calls.append(images.shape)
            b, h, w = images.shape[:3]
            return {"disp": np.ones((b, h, w), np.float32),
                    "depth": np.ones((b, h, w), np.float32)}

    v, stats = bench.bench_serving(size=32, max_batch=4, clients=4,
                                   total_requests=8, estimator=_Stub())
    assert v > 0
    assert stats["served"] >= 8  # + warmup posts
    # warmup covered every bucket the batcher can pad to
    for b in (1, 2, 4):
        assert (b, 32, 32, 3) in calls


def test_bench_per_config_tolerances():
    """Noisy configs (serving, batch-1 latency) gate at their own wider
    tolerance (bench.TOLERANCES) instead of the flat 15%."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    old = [
        {"config": "7_http_serving_512px", "value": 10.0},
        {"config": "1_single_image_384px_standard", "value": 100.0},
    ]
    # -30%: within the serving config's 40% band, outside the default 15%
    new = [
        {"config": "7_http_serving_512px", "value": 7.0},
        {"config": "1_single_image_384px_standard", "value": 80.0},  # -20% < 25%
    ]
    assert bench.compare_results(new, old) == []
    # a genuine serving collapse (-50%) still flags
    new[0]["value"] = 5.0
    regs = bench.compare_results(new, old)
    assert [r["config"] for r in regs] == ["7_http_serving_512px"]
    assert regs[0]["tolerance_pct"] == 40.0
