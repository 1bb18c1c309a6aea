"""SimMIM masked-image-modeling pretraining (train/pretrain.py +
cli/mars_pretrain.py): masking semantics, loss descent, handoff tree
compatibility with the depth encoder, npz round-trip through the
MONODEPTH_TPU_VIT_WEIGHTS hook, and CLI e2e on a tiny corpus."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monodepth_tpu.train.pretrain import (
    SimMIM, SimMIMPretrainer, load_vit_npz, masked_l1, patchify,
    save_vit_npz,
)

TINY = dict(vit_variant="small", image_size=64, dtype="float32",
            learning_rate=1e-3, warmup_steps=2, total_steps=30, seed=0)


def test_patchify_roundtrip_order():
    """Patch order must match the patch-embed conv's token order
    (row-major over the grid)."""
    img = np.arange(2 * 32 * 32 * 3, dtype=np.float32).reshape(2, 32, 32, 3)
    p = np.asarray(patchify(jnp.asarray(img), 16))
    assert p.shape == (2, 4, 16 * 16 * 3)
    np.testing.assert_array_equal(
        p[0, 1].reshape(16, 16, 3), img[0, :16, 16:32])
    np.testing.assert_array_equal(
        p[1, 2].reshape(16, 16, 3), img[1, 16:, :16])


def test_masked_l1_counts_only_masked():
    pred = jnp.ones((1, 4, 8))
    target = jnp.zeros((1, 4, 8))
    mask = jnp.asarray([[1.0, 0.0, 0.0, 1.0]])
    assert float(masked_l1(pred, target, mask)) == pytest.approx(1.0)
    assert float(masked_l1(pred, pred, mask)) == pytest.approx(0.0)


def test_mask_token_changes_masked_patch_features_only():
    """With the mask on, predictions at masked positions must differ from
    the unmasked forward (the mask token replaced those embeddings), while
    an all-zeros mask must not create the mask_token param at all."""
    model = SimMIM(vit_variant="small", image_size=64, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    n = 16
    mask = jnp.zeros((1, n)).at[0, 3].set(1.0)
    variables = model.init(jax.random.PRNGKey(0), x, mask)
    assert "mask_token" in variables["params"]["vit"]
    out_masked = model.apply(variables, x, mask)
    out_clear = model.apply(variables, x, jnp.zeros((1, n)))
    # the masked patch's reconstruction changed
    assert float(jnp.abs(out_masked[0, 3] - out_clear[0, 3]).max()) > 1e-4


def test_pretrainer_loss_decreases():
    trainer = SimMIMPretrainer(TINY)
    rng = np.random.default_rng(1)
    # a tiny corpus with real structure: smooth gradients + blocks
    yy, xx = np.mgrid[0:64, 0:64] / 64.0
    imgs = np.stack([np.stack([yy * a, xx * b, (yy + xx) * 0.5 * a], -1)
                     for a, b in rng.uniform(0.3, 1.0, size=(8, 2))]
                    ).astype(np.float32)
    first = trainer.train_batch(imgs)
    for _ in range(14):
        last = trainer.train_batch(imgs)
    assert last < first * 0.8, (first, last)


def test_vit_export_tree_matches_encoder_and_npz_roundtrip(tmp_path):
    """The exported subtree must satisfy the SAME compatibility check the
    real torchvision weights go through (weights.vit_params_compatible
    against the depth encoder's params['encoder']['vit'])."""
    from monodepth_tpu.models import DepthAnything
    from monodepth_tpu.models.weights import vit_params_compatible

    trainer = SimMIMPretrainer(dict(TINY))
    vit = trainer.vit_params()
    assert "mask_token" not in vit

    model = DepthAnything(vit_variant="small", scales=(0,),
                          output_scales=(0,))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    template = model.init(jax.random.PRNGKey(0), x)["params"]["encoder"]["vit"]
    # image_size 64 pos-embed (17 tokens) differs from the encoder's 224
    # (197): compatibility correctly refuses the mismatched pos grid
    assert not vit_params_compatible(vit, template)

    path = os.path.join(tmp_path, "vit.npz")
    save_vit_npz(vit, path)
    loaded = load_vit_npz(path)
    assert set(loaded) == set(vit)
    flat_a = jax.tree_util.tree_leaves(vit)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert all(np.allclose(a, b) for a, b in zip(flat_a, flat_b))


def test_env_hook_loads_npz(tmp_path, monkeypatch):
    """MONODEPTH_TPU_VIT_WEIGHTS=<npz> must flow through
    maybe_load_pretrained_vit and into the adapter's pretrained branch when
    trained at the encoder's 224 geometry."""
    from monodepth_tpu.models import DepthAnything
    from monodepth_tpu.models.weights import (
        maybe_load_pretrained_vit, vit_params_compatible,
    )

    trainer = SimMIMPretrainer(dict(TINY, image_size=224))
    path = os.path.join(tmp_path, "vit_simmim.npz")
    save_vit_npz(trainer.vit_params(), path)
    monkeypatch.setenv("MONODEPTH_TPU_VIT_WEIGHTS", path)

    loaded = maybe_load_pretrained_vit()
    assert loaded is not None
    model = DepthAnything(vit_variant="small", scales=(0,),
                          output_scales=(0,))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    template = model.init(jax.random.PRNGKey(0), x)["params"]["encoder"]["vit"]
    assert vit_params_compatible(loaded, template)


@pytest.mark.slow
def test_cli_e2e(tmp_path):
    """Two pretrain epochs on a tiny synthetic corpus through the CLI."""
    from PIL import Image

    from monodepth_tpu.cli.mars_pretrain import main

    rng = np.random.default_rng(0)
    frames = tmp_path / "frames"
    for source in ("rover",):
        d = frames / source
        d.mkdir(parents=True)
        for i in range(6):
            arr = (rng.uniform(size=(80, 80, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"f{i}.png")
    save = tmp_path / "vit.npz"
    rc = main(["--frames", str(frames), "--work_dir",
               str(tmp_path / "work"), "--sources", "rover",
               "--epochs", "2", "--batch_size", "2", "--image_size", "64",
               "--load_size", "72", "--vit", "small", "--dtype", "float32",
               "--val_per_source", "1", "--num_workers", "0",
               "--save", str(save), "--save_every", "2"])
    assert rc == 0 and save.exists()
    tree = load_vit_npz(str(save))
    assert "pos_embedding" in tree and "mask_token" not in tree
