"""In-domain self-supervised encoder pretraining (SimMIM-style masked image
modeling).

Why this exists: the reference's entire depth quality rests on ImageNet
pretrained ViT weights (reference encoder.py:29-35, IMAGENET1K_V1); in a
zero-egress environment those weights cannot be downloaded, and neither
self-supervised depth objective can bootstrap structure from random init —
the sequence objective's automask starves gradient on screenshot-style pairs
(identity reprojection wins everywhere while depth/pose are uninformative),
and the photometric objective's synthetic source views are rendered at a
constant-depth plane whose global optimum is a collapsed constant map.

Masked image modeling has no such degenerate optimum: reconstructing masked
patches from visible context REQUIRES image-dependent features.  This module
pretrains the same `VisionTransformer` the depth models use (SimMIM, Xie et
al. 2022: mask patch embeddings with a learned token, full encoder, linear
per-patch pixel head, L1 on masked patches) on the Mars corpus itself, then
exports the ViT subtree for `mars_finetune` to start from — the
in-environment substitute for the torchvision download.

Handoff: `save_vit_npz` writes the trained ViT params (mask_token stripped,
so the tree matches the depth encoder's) as a flat .npz;
`models.weights.maybe_load_pretrained_vit` consumes it via
MONODEPTH_TPU_VIT_WEIGHTS, the same hook real torchvision weights use.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from monodepth_tpu.models.encoder import VIT_VARIANTS, _range_normalize
from monodepth_tpu.models.vit import VisionTransformer

__all__ = ["SimMIM", "SimMIMPretrainer", "save_vit_npz", "load_vit_npz"]


class SimMIM(nn.Module):
    """Masked-image-modeling wrapper around the depth models' ViT backbone.

    __call__(x [B, S, S, 3] in [0, 1]-ish, token_mask [B, (S/16)^2] {0,1})
    -> per-patch pixel predictions [B, (S/16)^2, 16*16*3] in the
    range-normalized space the encoder feeds the ViT
    (models/encoder.py:136).
    """

    vit_variant: str = "base"
    image_size: int = 224
    patch_size: int = 16
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, token_mask):
        spec = VIT_VARIANTS[self.vit_variant]
        x = _range_normalize(x).astype(self.dtype)
        taps = VisionTransformer(
            image_size=self.image_size,
            patch_size=self.patch_size,
            hidden_dim=spec["hidden_dim"],
            num_layers=spec["num_layers"],
            num_heads=spec["num_heads"],
            mlp_dim=spec["mlp_dim"],
            # the LAST block: pretrain the full depth of the tower the
            # depth encoder taps at (2, 5, 8, 11)
            tap_indices=(spec["num_layers"] - 1,),
            dtype=self.dtype,
            name="vit",
        )(x, token_mask=token_mask)
        tokens = taps[-1][:, 1:, :]  # drop CLS
        pred = nn.Dense(self.patch_size * self.patch_size * 3,
                        dtype=self.dtype, name="recon_head")(tokens)
        return pred.astype(jnp.float32)


def patchify(images, patch: int = 16):
    """[B, H, W, 3] -> [B, (H/p)*(W/p), p*p*3] (row-major patches, matching
    the patch-embed conv's token order)."""
    b, h, w, c = images.shape
    nh, nw = h // patch, w // patch
    x = images.reshape(b, nh, patch, nw, patch, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, nh * nw, patch * patch * c)


def masked_l1(pred, target, mask):
    """Mean absolute error over MASKED patches only (SimMIM eq. 1)."""
    per_patch = jnp.mean(jnp.abs(pred - target), axis=-1)  # [B, N]
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(per_patch * mask) / denom


class SimMIMPretrainer:
    """Lean single-chip pretraining loop over an image loader.

    cfg keys (all have defaults): vit_variant, image_size, mask_ratio,
    learning_rate, weight_decay, warmup_steps, total_steps (for the cosine
    schedule), seed, dtype.
    """

    def __init__(self, cfg: Optional[Dict] = None):
        cfg = dict(cfg or {})
        self.variant = cfg.get("vit_variant", "base")
        self.image_size = int(cfg.get("image_size", 224))
        self.patch = 16
        self.mask_ratio = float(cfg.get("mask_ratio", 0.6))
        self.seed = int(cfg.get("seed", 0))
        dtype = cfg.get("dtype", "bfloat16")
        self.model = SimMIM(
            vit_variant=self.variant, image_size=self.image_size,
            dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)

        n_tokens = (self.image_size // self.patch) ** 2
        self.n_tokens = n_tokens
        rng = jax.random.PRNGKey(self.seed)
        dummy = jnp.zeros((1, self.image_size, self.image_size, 3),
                          jnp.float32)
        dummy_mask = jnp.zeros((1, n_tokens), jnp.float32)
        self.params = self.model.init(rng, dummy, dummy_mask)["params"]

        lr = float(cfg.get("learning_rate", 3e-4))
        total = max(int(cfg.get("total_steps", 2000)), 2)
        # short shakeout runs: warmup can't exceed the run
        warmup = min(int(cfg.get("warmup_steps", 100)), total // 2)
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr, warmup_steps=warmup,
            decay_steps=total, end_value=lr * 0.01)
        self.tx = optax.adamw(schedule,
                              weight_decay=float(cfg.get("weight_decay",
                                                         0.05)))
        self.opt_state = self.tx.init(self.params)
        self.step = 0
        self._rng = np.random.default_rng(self.seed + 1)

        model = self.model

        def loss_fn(params, images, mask):
            pred = model.apply({"params": params}, images, mask)
            target = patchify(
                _range_normalize(images).astype(jnp.float32), self.patch)
            return masked_l1(pred, target, mask)

        @jax.jit
        def train_step(params, opt_state, images, mask):
            loss, grads = jax.value_and_grad(loss_fn)(params, images, mask)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._train_step = train_step
        self._eval_loss = jax.jit(loss_fn)

    def sample_mask(self, batch: int) -> np.ndarray:
        """Per-sample random patch masks at `mask_ratio` (without
        replacement, so every sample masks the same count)."""
        k = max(1, int(round(self.n_tokens * self.mask_ratio)))
        mask = np.zeros((batch, self.n_tokens), np.float32)
        for i in range(batch):
            idx = self._rng.choice(self.n_tokens, size=k, replace=False)
            mask[i, idx] = 1.0
        return mask

    def train_batch(self, images: np.ndarray) -> float:
        mask = jnp.asarray(self.sample_mask(images.shape[0]))
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, jnp.asarray(images), mask)
        self.step += 1
        return float(loss)

    def eval_batch(self, images: np.ndarray) -> float:
        mask = jnp.asarray(self.sample_mask(images.shape[0]))
        return float(self._eval_loss(self.params, jnp.asarray(images), mask))

    # ------------------------------------------------------------- export
    def vit_params(self) -> Dict:
        """The trained ViT subtree with pretraining-only params stripped —
        exactly the depth encoder's params['encoder']['vit'] tree."""
        vit = dict(self.params["vit"])
        vit.pop("mask_token", None)
        return vit


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict) or hasattr(v, "items"):
            out.update(_flatten(dict(v), key))
        else:
            out[key] = np.asarray(v)
    return out


def save_vit_npz(vit_params: Dict, path: str) -> None:
    """Serialize a ViT param subtree as a flat .npz ('/'-joined keys)."""
    np.savez(path, **_flatten(vit_params))


def load_vit_npz(path: str) -> Dict:
    """Inverse of `save_vit_npz`: nested dict of np arrays."""
    flat = np.load(path)
    tree: Dict = {}
    for key in flat.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return tree
