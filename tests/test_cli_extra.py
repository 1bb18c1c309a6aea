"""E2E tests for the remaining CLIs: monodepth, benchmark CLIs, finetune,
plus debugging/logging utilities."""

import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_imgs")
    rng = np.random.default_rng(3)
    for name in ("rover_a.png", "rover_b.png"):
        arr = (rng.random((40, 56, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / name)
    return d


def test_monodepth_cli(image_dir, tmp_path):
    from monodepth_tpu.cli.monodepth import main

    out = tmp_path / "out"
    rc = main(["--image_path", str(image_dir / "rover_a.png"),
               "--output_dir", str(out), "--max_size", "56"])
    assert rc == 0
    assert (out / "rover_a_depth.png").exists()
    assert (out / "rover_a_depth.npy").exists()


def test_benchmark_depth_models_cli(image_dir, tmp_path):
    from monodepth_tpu.cli.benchmark_depth_models import main

    out = tmp_path / "bench"
    rc = main(["--input", str(image_dir), "--output_dir", str(out),
               "--max_size", "48", "--max_images", "1"])
    assert rc == 0
    summary = json.load(open(out / "benchmark_summary.json"))
    assert set(summary) == {"standard", "enhanced"}
    for s in summary.values():
        assert np.isfinite(s["mean_quality"])
    assert (out / "comparison_grid.png").exists()


def test_benchmark_models_cli(image_dir, tmp_path):
    from monodepth_tpu.cli.benchmark_models import main

    out = tmp_path / "zoo"
    rc = main(["--input", str(image_dir), "--output_dir", str(out),
               "--max_size", "48", "--max_images", "1",
               "--models", "depth_anything,midas,nonexistent"])
    assert rc == 0  # midas unavailable (zero egress) and unknown model skipped
    import pandas as pd

    df = pd.read_csv(out / "benchmark_results.csv")
    assert set(df["model"]) == {"depth_anything"}


def test_benchmark_models_local_baseline_ckpt(image_dir, tmp_path):
    """VERDICT r2 item 10: --baseline_ckpt NAME=PATH runs an external
    baseline from a locally mounted TorchScript artifact, no egress."""
    torch = pytest.importorskip("torch")

    from monodepth_tpu.cli.benchmark_models import main

    class TinyDepth(torch.nn.Module):
        def forward(self, x):  # [1, 3, H, W] -> [H, W] inverse-brightness
            return 1.0 / (x.mean(dim=1)[0] + 0.1)

    ckpt = tmp_path / "tiny_baseline.pt"
    torch.jit.save(torch.jit.script(TinyDepth()), str(ckpt))

    out = tmp_path / "zoo_local"
    rc = main(["--input", str(image_dir), "--output_dir", str(out),
               "--max_size", "48", "--max_images", "1",
               "--models", "depth_anything",
               "--baseline_ckpt", f"tiny=%s" % ckpt])
    assert rc == 0
    import pandas as pd

    df = pd.read_csv(out / "benchmark_results.csv")
    assert set(df["model"]) == {"depth_anything", "tiny"}
    tiny_rows = df[df["model"] == "tiny"]
    assert np.isfinite(tiny_rows["quality_score"]).all()


def test_mars_finetune_cli_synthetic(image_dir, tmp_path):
    from monodepth_tpu.cli.mars_finetune import main

    rc = main([
        "--data_dir", str(tmp_path / "data"),
        "--seed_dir", str(image_dir),
        "--num_epochs", "1",
        "--batch_size", "2",
        "--height", "32", "--width", "48",
        "--save_dir", str(tmp_path / "ckpt"),
        "--num_variants", "4",
        "--loader_backend", "grain",  # train e2e through the Grain pipeline
    ])
    assert rc == 0
    # synthetic dataset materialized + checkpoint + logs written
    assert os.path.isdir(tmp_path / "data" / "rover" / "train")
    assert os.path.isdir(tmp_path / "ckpt")
    logs = tmp_path / "ckpt" / "logs" / "metrics.jsonl"
    assert logs.exists()
    lines = [json.loads(l) for l in open(logs)]
    assert any("train/total" in l for l in lines)


def test_mars_finetune_cli_mesh(image_dir, tmp_path):
    """--mesh shards the CLI-driven train loop over the virtual device mesh
    (data-parallel); the run completes and logs finite losses."""
    from monodepth_tpu.cli.mars_finetune import main

    rc = main([
        "--data_dir", str(tmp_path / "data"),
        "--seed_dir", str(image_dir),
        "--num_epochs", "1",
        "--batch_size", "4",
        "--height", "32", "--width", "48",
        "--save_dir", str(tmp_path / "ckpt"),
        "--num_variants", "4",
        "--mesh", "data=4",
    ])
    assert rc == 0
    logs = tmp_path / "ckpt" / "logs" / "metrics.jsonl"
    lines = [json.loads(l) for l in open(logs)]
    vals = [l["train/total"] for l in lines if "train/total" in l]
    assert vals and all(np.isfinite(v) for v in vals)


def test_mars_finetune_cli_fsdp(image_dir, tmp_path):
    """--fsdp shards params + optimizer state over the data axis through
    the CLI path (full coverage in tests/test_fsdp.py); without --mesh it
    refuses loudly."""
    from monodepth_tpu.cli.mars_finetune import main

    args = [
        "--data_dir", str(tmp_path / "data"),
        "--seed_dir", str(image_dir),
        "--num_epochs", "1",
        "--batch_size", "4",
        "--height", "32", "--width", "48",
        "--save_dir", str(tmp_path / "ckpt"),
        "--num_variants", "4",
        "--fsdp",
    ]
    with pytest.raises(SystemExit):
        main(args)
    rc = main(args + ["--mesh", "data=4,model=2"])
    assert rc == 0


def test_assert_tree_finite():
    from monodepth_tpu.utils.debugging import assert_tree_finite

    assert_tree_finite({"a": np.ones(3)})  # fine
    with pytest.raises(ValueError, match="a/b"):
        assert_tree_finite({"a": {"b": np.array([1.0, np.nan])}})


def test_deterministic_rng():
    from monodepth_tpu.utils.debugging import deterministic_rng

    g1, g2 = deterministic_rng(7), deterministic_rng(7)
    import numpy as np

    np.testing.assert_array_equal(np.asarray(g1()), np.asarray(g2()))
    assert not np.array_equal(np.asarray(g1()), np.asarray(g1()))


def test_metrics_logger(tmp_path):
    from monodepth_tpu.utils.logging import MetricsLogger

    logger = MetricsLogger(str(tmp_path / "logs"))
    logger.log(1, {"loss": 0.5}, prefix="train")
    logger.log(2, {"loss": 0.4}, prefix="train")
    logger.close()
    lines = [json.loads(l) for l in open(tmp_path / "logs" / "metrics.jsonl")]
    assert lines[0]["train/loss"] == 0.5 and lines[1]["step"] == 2


def test_run_mars_depth_depth_video(image_dir, tmp_path):
    from monodepth_tpu.cli.run_mars_depth import main

    out = tmp_path / "video_out"
    rc = main(["--input", str(image_dir), "--output_dir", str(out),
               "--max_size", "48", "--depth_video"])
    assert rc == 0
    video = out / "depth_video.mp4"
    assert video.exists() and video.stat().st_size > 0


def test_evaluate_cli_gt_and_proxy(tmp_path, rng=np.random.default_rng(0)):
    from monodepth_tpu.cli.evaluate import main

    pred_dir = tmp_path / "preds"
    gt_dir = tmp_path / "gt"
    pred_dir.mkdir()
    gt_dir.mkdir()
    depth = (rng.random((32, 32)) * 5 + 1).astype(np.float32)
    np.save(pred_dir / "a_depth.npy", depth * 1.05)
    np.save(gt_dir / "a_depth.npy", depth)

    rc = main(["--pred_dir", str(pred_dir), "--gt_dir", str(gt_dir),
               "--output_dir", str(tmp_path / "eval")])
    assert rc == 0
    report = json.load(open(tmp_path / "eval" / "metrics.json"))
    assert abs(report["mean"]["abs_rel"] - 0.05) < 1e-3

    rc2 = main(["--pred_dir", str(pred_dir),
                "--output_dir", str(tmp_path / "eval2")])
    assert rc2 == 0
    report2 = json.load(open(tmp_path / "eval2" / "metrics.json"))
    assert report2["mode"] == "no_reference"
    assert np.isfinite(report2["mean"]["entropy"])


def test_run_mars_depth_temporal_smooth(image_dir, tmp_path):
    from monodepth_tpu.cli.run_mars_depth import main

    out = tmp_path / "temporal_out"
    rc = main(["--input", str(image_dir), "--output_dir", str(out),
               "--max_size", "48", "--temporal_smooth", "2"])
    assert rc == 0
    a = np.load(out / "rover_a" / "rover_a_depth.npy")
    b = np.load(out / "rover_b" / "rover_b_depth.npy")
    assert np.isfinite(a).all() and np.isfinite(b).all()


def test_native_attn_flags_reach_model_config(monkeypatch):
    """--attn_window/--global_pool flow into ModelConfig only with
    --native_resolution (parity path stays untouched)."""
    from monodepth_tpu.cli import run_mars_depth as cli

    captured = {}

    class _FakeEstimator:
        def __init__(self, config, seed=0, mesh=None):
            captured["config"] = config
            raise RuntimeError("stop-after-config")

    monkeypatch.setattr(cli, "MarsDepthEstimator", _FakeEstimator)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="stop-after-config"):
        cli.main(["--input", __file__, "--native_resolution",
                  "--attn_window", "8", "--global_pool", "2"])
    cfg = captured["config"]
    assert cfg.native_patching and cfg.attn_window == 8
    assert cfg.attn_global_pool == 2

    with _pytest.raises(RuntimeError, match="stop-after-config"):
        cli.main(["--input", __file__, "--global_pool", "2"])
    cfg = captured["config"]
    assert not cfg.native_patching
    assert cfg.attn_window == 0 and cfg.attn_global_pool == 0
