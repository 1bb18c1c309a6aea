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
