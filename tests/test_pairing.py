"""Sequence-pair curation tests (data/pairing.py + manifest-aware
MarsSequenceDataset + the mars_finetune --min_pairs gate)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from monodepth_tpu.data.dataset import MarsSequenceDataset
from monodepth_tpu.data.pairing import (
    MANIFEST_NAME,
    build_pair_manifest,
    frame_timestamp,
    load_pair_manifest,
    organize_sequence_dataset,
    pair_correlation,
    pair_statistics,
)


@pytest.fixture(scope="module")
def frames_dir(tmp_path_factory):
    """Flat timestamped folder: two 3-frame scenes plus one unrelated frame
    far away in time."""
    root = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(0)

    def smooth_scene(seed):
        """Low-frequency scene: small random field upsampled, so a few-pixel
        shift stays highly correlated (pure noise would not)."""
        r = np.random.default_rng(seed)
        small = (r.random((5, 9, 3)) * 255).astype(np.uint8)
        img = Image.fromarray(small).resize((70, 40), Image.BILINEAR)
        return np.asarray(img)

    base_a = smooth_scene(1)
    base_b = smooth_scene(2)
    frames = [
        ("Screenshot 2025-05-30 100000.png", base_a[:, 0:50]),
        ("Screenshot 2025-05-30 100010.png", base_a[:, 2:52]),
        ("Screenshot 2025-05-30 100025.png", base_a[:, 4:54]),
        # 50 min gap, different scene
        ("Screenshot 2025-05-30 105000.png", base_b[:, 0:50]),
        ("Screenshot 2025-05-30 105012.png", base_b[:, 3:53]),
        ("Screenshot 2025-05-30 105030.png", base_b[:, 6:56]),
        # unrelated noise frame, hours later
        ("Screenshot 2025-05-30 180000.png",
         (rng.random((40, 50, 3)) * 255).astype(np.uint8)),
    ]
    for name, arr in frames:
        Image.fromarray(arr).save(root / name)
    return str(root)


def test_frame_timestamp():
    assert frame_timestamp("Screenshot 2025-05-30 102533.png") is not None
    a = frame_timestamp("Screenshot 2025-05-30 102533.png")
    b = frame_timestamp("Screenshot 2025-05-30 102633.png")
    assert b - a == 60.0
    assert frame_timestamp("random_name.png") is None


def test_pair_correlation_orders_similarity(frames_dir):
    names = sorted(os.listdir(frames_dir))
    same_scene = pair_correlation(os.path.join(frames_dir, names[0]),
                                  os.path.join(frames_dir, names[1]))
    cross_scene = pair_correlation(os.path.join(frames_dir, names[0]),
                                   os.path.join(frames_dir, names[6]))
    assert same_scene > 0.5
    assert cross_scene < same_scene


def test_manifest_gates_gap_and_corr(frames_dir, tmp_path):
    out = str(tmp_path / "seq")
    n_train, n_val = organize_sequence_dataset(
        frames_dir, out, source="rover", val_fraction=0.15)
    assert n_train + n_val == 7 and n_val >= 1
    train_dir = os.path.join(out, "rover", "train")
    stats = build_pair_manifest(train_dir, max_gap_s=60, min_corr=0.35,
                                max_stride=1)
    # within-scene pairs accepted; the 50-min scene boundary rejected by gap
    assert stats["accepted"] >= 4  # >= 2 directed pairs per in-scene link
    assert stats["rejected_gap"] >= 1
    manifest = load_pair_manifest(train_dir)
    assert manifest and len(manifest) == stats["accepted"]
    # bidirectional: swapped duplicates present
    pairs = set(map(tuple, manifest))
    assert any((b, a) in pairs for a, b in pairs)


def test_sequence_dataset_prefers_manifest(frames_dir, tmp_path):
    out = str(tmp_path / "seq2")
    organize_sequence_dataset(frames_dir, out, source="rover",
                              val_fraction=0.15)
    train_dir = os.path.join(out, "rover", "train")
    ds_stride = MarsSequenceDataset(out, "train", height=32, width=48,
                                    sources=("rover",))
    n_stride = len(ds_stride)
    build_pair_manifest(train_dir, max_gap_s=60, min_corr=0.35, max_stride=1)
    ds_manifest = MarsSequenceDataset(out, "train", height=32, width=48,
                                      sources=("rover",))
    assert len(ds_manifest) != n_stride  # manifest replaced stride pairing
    item = ds_manifest[0]
    assert item["image"].shape == (32, 48, 6)
    # manifest entries naming missing files are dropped, not crashed on
    with open(os.path.join(train_dir, MANIFEST_NAME)) as f:
        data = json.load(f)
    data["pairs"].append(["missing_a.png", "missing_b.png"])
    with open(os.path.join(train_dir, MANIFEST_NAME), "w") as f:
        json.dump(data, f)
    ds2 = MarsSequenceDataset(out, "train", height=32, width=48,
                              sources=("rover",))
    assert len(ds2) == len(ds_manifest)


def test_pair_statistics_reports_modes(frames_dir, tmp_path):
    out = str(tmp_path / "seq3")
    organize_sequence_dataset(frames_dir, out, source="rover",
                              val_fraction=0.15)
    rep = pair_statistics(out, sources=("rover",))
    assert rep["rover/train"]["pairing"] == "stride"
    build_pair_manifest(os.path.join(out, "rover", "train"))
    rep = pair_statistics(out, sources=("rover",))
    assert rep["rover/train"]["pairing"] == "manifest"
    assert rep["rover/train"]["frames"] > 0


def test_finetune_min_pairs_gate(tmp_path):
    """A non-sequential folder (0 usable pairs after curation) aborts with a
    clear message instead of training on noise."""
    from monodepth_tpu.cli.mars_finetune import parse_args, report_sequence_pairs

    root = tmp_path / "data"
    d = root / "rover" / "train"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    # two unrelated frames -> 1 stride pair, below the default min of 4
    for i in range(2):
        arr = (rng.random((40, 50, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}.png")
    args = parse_args(["--data_dir", str(root), "--loss_mode", "sequence",
                       "--source_type", "rover"])
    with pytest.raises(SystemExit, match="min_pairs"):
        report_sequence_pairs(args)
    # with enough pairs the gate passes
    args = parse_args(["--data_dir", str(root), "--loss_mode", "sequence",
                       "--source_type", "rover", "--min_pairs", "1"])
    report_sequence_pairs(args)


def test_make_sequence_pairs_cli(frames_dir, tmp_path):
    from monodepth_tpu.cli.make_sequence_pairs import main

    out = str(tmp_path / "cli_out")
    rc = main(["--frames", os.path.dirname(frames_dir), "--out", out,
               "--sources", os.path.basename(frames_dir),
               "--max_gap_s", "60", "--min_corr", "0.35", "--max_stride", "1"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "pairing_report.json"))
    src = os.path.basename(frames_dir)
    assert load_pair_manifest(os.path.join(out, src, "train")) is not None


def test_restore_params_drops_training_only_subtrees(tmp_path):
    """A sequence-mode checkpoint carries params['pose'] (joint PoseNet,
    train/adapter.py); inference restore must drop it — the depth model's
    apply does not accept a 'pose' collection."""
    import jax.numpy as jnp

    from monodepth_tpu.train.checkpoints import restore_params, save_checkpoint

    state = {
        "params": {"encoder": {"w": jnp.ones((2, 2))},
                   "pose": {"w": jnp.zeros((3,))}},
        "batch_stats": {"bn": {"mean": jnp.zeros((2,))}},
        "step": 7,
    }
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, 1, state)
    template = {"params": {"encoder": {"w": jnp.zeros((2, 2))}},
                "batch_stats": {"bn": {"mean": jnp.ones((2,))}}}
    out = restore_params(ckpt_dir, template)
    assert set(out["params"]) == {"encoder"}
    np.testing.assert_allclose(np.asarray(out["params"]["encoder"]["w"]), 1.0)
    np.testing.assert_allclose(np.asarray(out["batch_stats"]["bn"]["mean"]), 0.0)
