"""Reference CLI invocations run verbatim: every flag spelling the reference's
argparse blocks accept (run_mars_depth.py:26-77, mars_finetune.py:21-58,
monodepth.py:23-41) parses here with the same meaning — drop-in migration."""

import numpy as np
import pytest

from monodepth_tpu.cli import mars_finetune, monodepth, run_mars_depth


def test_run_mars_depth_reference_flags():
    args = run_mars_depth.parse_args([
        "--input", "img.png", "--output_dir", "./out", "--source", "rover",
        "--max_size", "1024", "--show", "--batch_size", "4",
        "--terrain_reconstruction", "--enhanced_model",
        "--visualizations", "terrain_features", "--flyover", "--benchmark",
        "--multi_scale_fusion",
    ])
    assert args.source == "rover" and args.batch_size == 4
    assert args.multi_scale_fusion and args.enhanced_model


def test_mars_finetune_reference_flag_spellings():
    args = mars_finetune.parse_args([
        "--data_dir", "./mars_data", "--source_type", "mixed",
        "--batch_size", "8", "--epochs", "7", "--learning_rate", "1e-4",
        "--lr_scheduler_step_size", "5", "--lr_scheduler_gamma", "0.25",
        "--model_weights", "w.pth", "--output_dir", "./trained_models",
        "--no_cuda", "--height", "384", "--width", "512",
        "--depth_loss_weight", "2.0", "--smoothness_loss_weight", "0.01",
    ])
    assert args.num_epochs == 7
    assert args.scheduler_step_size == 5 and args.scheduler_gamma == 0.25
    assert args.depth_weight == 2.0 and args.smoothness_weight == 0.01
    assert args.save_dir == "./trained_models"
    assert args.model_weights == "w.pth"
    assert args.source_type == "mixed"


def test_mars_finetune_native_flag_spellings_still_work():
    args = mars_finetune.parse_args(
        ["--num_epochs", "3", "--scheduler_step_size", "2",
         "--depth_weight", "0.5", "--save_dir", "./ckpt"])
    assert args.num_epochs == 3 and args.scheduler_step_size == 2
    assert args.depth_weight == 0.5 and args.save_dir == "./ckpt"


def test_monodepth_reference_flag_spellings(tmp_path):
    args = monodepth.parse_args([
        "--image_path", str(tmp_path), "--output_dir", "out",
        "--ext", "png", "--mars_weights", "m.pth", "--no_cuda",
    ])
    assert args.weights == "m.pth" and args.ext == "png"


def test_monodepth_image_path_accepts_folder(tmp_path, monkeypatch):
    """Reference --image_path takes 'a single image or folder of images';
    --ext restricts the folder glob (monodepth.py:23-33)."""
    from PIL import Image

    for name in ("a.png", "b.jpg"):
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(tmp_path / name)

    collected = {}

    class _Est:
        def __init__(self, cfg):
            pass

        def convert_to_mars_domain(self, w):
            return self

        def predict(self, img, meta):
            collected.setdefault("n", 0)
            collected["n"] += 1
            return {"depth": np.ones(img.shape[:2], np.float32),
                    "disp": np.ones(img.shape[:2], np.float32)}

    monkeypatch.setattr(monodepth, "MarsDepthEstimator", _Est)
    rc = monodepth.main([
        "--image_path", str(tmp_path), "--ext", "png",
        "--output_dir", str(tmp_path / "out"),
    ])
    assert rc == 0
    assert collected["n"] == 1  # only a.png matches --ext png


@pytest.fixture(scope="module")
def tiny_train_tree(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("mw_data")
    rng = np.random.default_rng(0)
    for split, n in (("train", 4), ("val", 2)):
        d = root / "rover" / split
        d.mkdir(parents=True)
        for i in range(n):
            arr = (rng.random((40, 56, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.png")
    return str(root)


def test_adapter_starts_from_model_weights(tiny_train_tree, tmp_path):
    """--model_weights seeds the train state from a reference-format .pth
    (reference mars_finetune.py:38-40)."""
    import torch

    import jax
    from monodepth_tpu.config import ModelConfig, TrainConfig
    from monodepth_tpu.models.weights import export_reference_state_dict
    from monodepth_tpu.train.adapter import MarsDomainAdapter

    def cfg(**kw):
        return TrainConfig(
            model=ModelConfig(pretrained=False, **kw.pop("model_kw", {})),
            data_dir=tiny_train_tree, batch_size=2, num_epochs=1,
            height=32, width=48, checkpoint_dir="", num_workers=0, **kw,
        )

    src = MarsDomainAdapter(cfg(seed=3))
    sd = export_reference_state_dict(
        jax.tree_util.tree_map(np.asarray, src.params),
        jax.tree_util.tree_map(np.asarray, src.batch_stats),
    )
    path = tmp_path / "start.pth"
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, path)

    dst = MarsDomainAdapter(cfg(seed=9, model_kw={"checkpoint": str(path)}))
    leaves_a = jax.tree_util.tree_leaves(src.params)
    leaves_b = jax.tree_util.tree_leaves(dst.params)
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_run_mars_depth_shape_bucket_default():
    """Folder inference buckets shapes by default (round 5: ~20 s recompile
    per distinct image size otherwise); 0 restores per-shape compiles."""
    args = run_mars_depth.parse_args(["--input", "x.png"])
    assert args.shape_bucket == 128
    args = run_mars_depth.parse_args(["--input", "x.png",
                                      "--shape_bucket", "0"])
    assert args.shape_bucket == 0
