"""Mars domain adaptation / fine-tuning driver.

Capability of reference `MarsDomainAdapter` (train/mars_adapter.py:18-277),
rebuilt TPU-first:

- optax Adam with a 10x lower encoder learning rate via parameter labels
  (reference :49-55) and a StepLR-equivalent staircase schedule (:58-62)
- one fully jitted, donate-argnums train step updating params, optimizer
  state and BatchNorm batch_stats together; loss per train/losses.py
- validation with metrics vs the reference's simulated ground truth
  depth * (0.9 + 0.2 * U) (:180-198)
- Orbax checkpoints every N epochs + final, with resume (:112-113 upgraded
  to full train-state checkpointing)
- data-parallel batch sharding over a ('data', 'model') mesh; the mesh is
  optional — single-device runs use the same code path with a 1x1 mesh
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax.core import unfreeze

from monodepth_tpu.config import TrainConfig
from monodepth_tpu.layers import compute_depth_errors, disp_to_depth
from monodepth_tpu.models import disp_scale_factor
from monodepth_tpu.train.losses import compute_losses

__all__ = ["MarsDomainAdapter", "make_optimizer", "make_train_step"]


def make_lr_schedule(base_lr: float, steps_per_epoch: int,
                     step_size_epochs: int, gamma: float):
    """StepLR equivalent: lr * gamma^(epoch // step_size) as a step schedule."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * (gamma ** (epoch // step_size_epochs))

    return schedule


def _label_params(params) -> Dict:
    """'encoder' vs 'rest' labels (reference gives the encoder lr/10, :49-55)."""
    return {
        k: jax.tree_util.tree_map(lambda _: "encoder" if k == "encoder" else "rest", v)
        for k, v in params.items()
    }


def make_optimizer(params, cfg: TrainConfig, steps_per_epoch: int):
    """steps_per_epoch counts LOADER batches; with gradient accumulation the
    schedules tick on optimizer steps (one per `grad_accum_steps` batches)."""
    accum = max(getattr(cfg, "grad_accum_steps", 1), 1)
    opt_steps_per_epoch = max(steps_per_epoch // accum, 1)
    enc_schedule = make_lr_schedule(
        cfg.learning_rate * cfg.encoder_lr_factor, opt_steps_per_epoch,
        cfg.scheduler_step_size, cfg.scheduler_gamma,
    )
    rest_schedule = make_lr_schedule(
        cfg.learning_rate, opt_steps_per_epoch,
        cfg.scheduler_step_size, cfg.scheduler_gamma,
    )
    tx = optax.multi_transform(
        {"encoder": optax.adam(enc_schedule), "rest": optax.adam(rest_schedule)},
        _label_params(params),
    )
    if accum > 1:
        # Micro-batch gradient accumulation: k batches average into one
        # optimizer step (effective batch = k * batch_size at the HBM cost
        # of one micro-batch; pairs with --remat).  The accumulator lives
        # in opt_state, so mid-accumulation checkpoints resume exactly.
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def _constrain_tree(tree, shardings):
    """with_sharding_constraint on every leaf that has a NamedSharding
    (scalar optimizer counters etc. keep their default placement)."""
    from jax.sharding import NamedSharding

    return jax.tree_util.tree_map(
        lambda x, s: (jax.lax.with_sharding_constraint(x, s)
                      if isinstance(s, NamedSharding) else x),
        tree, shardings)


def make_train_step(model, tx, cfg: TrainConfig, state_shardings=None,
                    pose_net=None):
    """Build the jitted train step: (params, batch_stats, opt_state, images,
    scales, rng) -> (new trees, losses).

    state_shardings: optional (param_shardings, opt_state_shardings) pytrees
    (leaf = each input's `.sharding`).  Without the constraint GSPMD is free
    to emit replicated updated params/moments, silently un-doing FSDP after
    the first step; with it the outputs keep the input placement.

    pose_net: required for loss_mode='sequence' — its params live under
    params['pose'] and train jointly with the depth model (monodepth2)."""

    loss_mode = getattr(cfg, "loss_mode", "reference")
    # monodepth2 multi-scale supervision (TrainConfig.loss_scales): the
    # objective is averaged over these decoder scales, with the smoothness
    # term discounted by 2^-(finest - s) (scale 0 is the COARSEST here —
    # the reference's scale-index quirk, SURVEY.md §3.1 — so the finest
    # requested scale keeps the full weight).  Default (0,) = reference
    # behavior, bit-identical to the pre-multi-scale step.
    loss_scales = tuple(getattr(cfg, "loss_scales", (0,))) or (0,)
    finest = max(loss_scales)
    smooth_w = {s: cfg.smoothness_weight * (2.0 ** -(finest - s))
                for s in loss_scales}

    def _mean_losses(per_scale):
        if len(per_scale) == 1:
            return per_scale[0]
        return {k: sum(d[k] for d in per_scale) / len(per_scale)
                for k in per_scale[0]}

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, batch_stats, opt_state, images, scales, rng):
        def loss_fn(p):
            if loss_mode == "sequence":
                # joint depth + pose over real frame pairs (train/losses.py)
                from monodepth_tpu.train.losses import compute_losses_sequence

                target, source = images[..., :3], images[..., 3:]
                model_p = {k: v for k, v in p.items() if k != "pose"}
                outputs, mutated = model.apply(
                    {"params": model_p, "batch_stats": batch_stats},
                    target, scales, train=True, mutable=["batch_stats"],
                )
                axisangle, translation = pose_net.apply(
                    {"params": p["pose"]}, images)
                losses = _mean_losses([compute_losses_sequence(
                    target, source, outputs[("disp", s)],
                    axisangle, translation, rng,
                    depth_weight=cfg.depth_weight,
                    smoothness_weight=smooth_w[s],
                    min_depth=cfg.model.min_depth,
                    max_depth=cfg.model.max_depth,
                ) for s in loss_scales])
                return losses["total"], (mutated["batch_stats"], losses)
            if loss_mode == "supervised":
                # rendered ground truth rides as a 4th channel (the same
                # packing trick sequence mode uses at 6): split, forward
                # the RGB, score against the exact render depth
                # (train/losses.py compute_losses_supervised)
                from monodepth_tpu.train.losses import compute_losses_supervised

                rgb, depth_gt = images[..., :3], images[..., 3:]
                outputs, mutated = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    rgb, scales, train=True, mutable=["batch_stats"],
                )
                losses = _mean_losses([compute_losses_supervised(
                    rgb, outputs[("disp", s)], depth_gt,
                    depth_weight=cfg.depth_weight,
                    smoothness_weight=smooth_w[s],
                    min_depth=cfg.model.min_depth,
                    max_depth=cfg.model.max_depth,
                ) for s in loss_scales])
                return losses["total"], (mutated["batch_stats"], losses)
            if loss_mode == "photometric":
                # SSIM+L1 reprojection objective (train/losses.py); the rng
                # is shared across scales, so every scale reprojects through
                # the same sampled pose (monodepth2 semantics) and XLA CSEs
                # the synthetic source view render
                from monodepth_tpu.train.losses import compute_losses_photometric

                outputs, mutated = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    images, scales, train=True, mutable=["batch_stats"],
                )
                losses = _mean_losses([compute_losses_photometric(
                    images, outputs[("disp", s)], rng,
                    depth_weight=cfg.depth_weight,
                    smoothness_weight=smooth_w[s],
                    min_depth=cfg.model.min_depth,
                    max_depth=cfg.model.max_depth,
                ) for s in loss_scales])
                return losses["total"], (mutated["batch_stats"], losses)
            if loss_mode == "flip":
                # one forward over [images; flipped images] for the
                # flip-consistency objective (train/losses.py)
                from monodepth_tpu.train.losses import compute_losses_flip

                both = jnp.concatenate([images, images[:, :, ::-1, :]], axis=0)
                both_scales = jnp.concatenate([scales, scales], axis=0)
                outputs, mutated = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    both, both_scales, train=True, mutable=["batch_stats"],
                )
                b = images.shape[0]
                losses = _mean_losses([compute_losses_flip(
                    images, outputs[("disp", s)][:b], outputs[("disp", s)][b:],
                    depth_weight=cfg.depth_weight,
                    smoothness_weight=smooth_w[s],
                ) for s in loss_scales])
                return losses["total"], (mutated["batch_stats"], losses)
            outputs, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images, scales, train=True, mutable=["batch_stats"],
            )
            losses = _mean_losses([compute_losses(
                images, outputs, rng,
                depth_weight=cfg.depth_weight,
                smoothness_weight=smooth_w[s],
                min_depth=cfg.model.min_depth,
                max_depth=cfg.model.max_depth,
                scale=s,
            ) for s in loss_scales])
            return losses["total"], (mutated["batch_stats"], losses)

        grads, (new_stats, losses) = jax.grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        if state_shardings is not None:
            new_params = _constrain_tree(new_params, state_shardings[0])
            new_opt_state = _constrain_tree(new_opt_state, state_shardings[1])
        return new_params, new_stats, new_opt_state, losses

    return train_step


def make_eval_step(model, cfg: TrainConfig):
    @jax.jit
    def eval_step(params, batch_stats, images, scales, rng):
        depth_gt = None
        if images.shape[-1] == 6:  # sequence pairs: validate on the target
            images = images[..., :3]
        elif images.shape[-1] == 4:  # supervised: rendered GT channel
            images, depth_gt = images[..., :3], images[..., 3:]
        params = {k: v for k, v in params.items() if k != "pose"}
        outputs = model.apply(
            {"params": params, "batch_stats": batch_stats}, images, scales
        )
        losses = compute_losses(
            images, outputs, rng,
            depth_weight=cfg.depth_weight,
            smoothness_weight=cfg.smoothness_weight,
        )
        disp = outputs[("disp", 0)]
        _, depth = disp_to_depth(disp, cfg.model.min_depth, cfg.model.max_depth)
        if depth_gt is not None:
            # REAL depth errors against the rendered ground truth, with
            # median scaling (the renderer's units are arbitrary — the
            # Eigen protocol for scale-ambiguous predictions)
            ratio = (jnp.median(depth_gt, axis=(1, 2, 3), keepdims=True)
                     / jnp.maximum(jnp.median(depth, axis=(1, 2, 3),
                                              keepdims=True), 1e-9))
            errs = compute_depth_errors(depth_gt, depth * ratio)
        else:
            # simulated GT, as in the reference validation (:190)
            fake_gt = depth * (0.9 + 0.2 * jax.random.uniform(rng, depth.shape))
            errs = compute_depth_errors(fake_gt, depth)
        return losses, errs

    return eval_step


class MarsDomainAdapter:
    """Fine-tuning driver over the Mars dataset."""

    METRIC_NAMES = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")

    def __init__(self, cfg: TrainConfig, train_loader=None, val_loader=None,
                 mesh=None):
        self.cfg = cfg
        import dataclasses

        from monodepth_tpu.models import build_model

        # quantize is a serving-only knob (per-tensor activation scales are
        # calibrated for inference); training always runs the full-precision
        # tower regardless of the config's serving setting
        self.model = build_model(dataclasses.replace(cfg.model, quantize=""))

        if train_loader is None or val_loader is None:
            from monodepth_tpu.data.dataset import get_mars_dataloaders
            from monodepth_tpu.parallel.distributed import (
                process_count, process_index,
            )

            tr, va, _ = get_mars_dataloaders(
                cfg.data_dir, cfg.batch_size, cfg.height, cfg.width,
                prefetch=2, seed=cfg.seed,
                source_type=cfg.source_type,
                num_workers=cfg.num_workers,
                shard_index=process_index(), shard_count=process_count(),
                backend=("numpy" if cfg.loss_mode == "supervised"
                         else cfg.loader_backend),
                sequence=(cfg.loss_mode == "sequence"),
                rendered=(cfg.loss_mode == "supervised"),
                render_length=getattr(cfg, "render_length", 512),
                render_texture_dir=getattr(cfg, "render_texture_dir", "")
                or None,
            )
            train_loader = train_loader or tr
            val_loader = val_loader or va
        self.train_loader = train_loader
        self.val_loader = val_loader

        # Init model variables.
        rng = jax.random.PRNGKey(cfg.seed)
        dummy = jnp.zeros((1, cfg.height, cfg.width, 3), jnp.float32)
        variables = self.model.init(rng, dummy, train=False)
        self.params = unfreeze(variables["params"]) if hasattr(variables["params"], "unfreeze") else dict(variables["params"])
        self.batch_stats = dict(variables["batch_stats"])

        if cfg.model.checkpoint:
            # Start fine-tuning from a full-model checkpoint (reference
            # mars_finetune.py:38-40 --model_weights): reference .pth or
            # Orbax dir, same loader as the inference estimator.
            from monodepth_tpu.models.weights import load_model_variables

            loaded = load_model_variables(
                {"params": self.params, "batch_stats": self.batch_stats},
                cfg.model.checkpoint, enhanced=cfg.model.enhanced,
            )
            self.params = dict(loaded["params"])
            self.batch_stats = dict(loaded["batch_stats"])
        elif cfg.model.pretrained:
            from monodepth_tpu.models.weights import (
                maybe_load_pretrained_vit, vit_params_compatible,
            )

            vit = maybe_load_pretrained_vit()
            if vit is not None:
                if vit_params_compatible(vit, self.params["encoder"]["vit"]):
                    self.params["encoder"] = dict(self.params["encoder"])
                    self.params["encoder"]["vit"] = vit
                else:
                    print(f"Pretrained ViT checkpoint does not match "
                          f"vit_variant={cfg.model.vit_variant!r}; "
                          f"keeping random init")

        self.pose_net = None
        if cfg.loss_mode == "sequence":
            # Joint depth+pose training (monodepth2): the PoseNet's params
            # live under params['pose'] so the optimizer, checkpoints, mesh
            # placement and FSDP all see one tree.  The pose net is a
            # training-time device only — inference/export never load it
            # (which is also why this runs AFTER checkpoint loading: a
            # depth-only .pth/orbax checkpoint must not erase it).
            from monodepth_tpu.models.pose import PoseNet

            self.pose_net = PoseNet()
            pose_vars = self.pose_net.init(
                jax.random.PRNGKey(cfg.seed + 2),
                jnp.zeros((1, cfg.height, cfg.width, 6), jnp.float32))
            self.params["pose"] = dict(pose_vars["params"])

        self.mesh = mesh
        self._warned_ragged = False
        self._place_on_mesh()

        # Optimizer state is created AFTER mesh placement so its leaves
        # (Adam moments, MultiSteps accumulators) inherit each param's
        # sharding — with cfg.fsdp that is what shards the optimizer
        # memory over the 'data' axis (ZeRO-3 behavior).
        steps_per_epoch = max(len(self.train_loader), 1)
        self.tx = make_optimizer(self.params, cfg, steps_per_epoch)
        self.opt_state = self.tx.init(self.params)
        self.step = 0
        self.epoch = 0

        self._train_step = make_train_step(
            self.model, self.tx, cfg, state_shardings=self._state_shardings(),
            pose_net=self.pose_net)
        self._eval_step = make_eval_step(self.model, cfg)
        self._rng = jax.random.PRNGKey(cfg.seed + 1)

        self._ckpt_mgr = None
        if cfg.checkpoint_dir:
            from monodepth_tpu.train.checkpoints import CheckpointManager

            self._ckpt_mgr = CheckpointManager(cfg.checkpoint_dir)
            if cfg.resume:
                self._try_resume()

    def _state_shardings(self):
        """(param, opt_state) sharding pytrees for the train step's output
        constraints; None without a mesh."""
        if self.mesh is None:
            return None
        shard_of = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda x: getattr(x, "sharding", None), t)
        return (shard_of(self.params), shard_of(self.opt_state))

    def _place_on_mesh(self):
        """Shard params/batch_stats per the mesh rules (TP + optional FSDP).
        No-op without a mesh."""
        if self.mesh is None:
            return
        from monodepth_tpu.parallel.mesh import shard_params

        placed = shard_params(
            {"params": self.params, "batch_stats": self.batch_stats},
            self.mesh, fsdp=getattr(self.cfg, "fsdp", False),
        )
        self.params = placed["params"]
        self.batch_stats = placed["batch_stats"]

    # ------------------------------------------------------------- state
    def _state_dict(self, boundary: bool = True):
        return {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
            "step": self.step,
            "epoch": self.epoch,
            "rng": self._rng,
            # 1 = epoch-boundary state (next epoch starts fresh); 0 = mid-
            # epoch step-cadence state (needs the sidecar loader position)
            "boundary": int(boundary),
        }

    def _data_state_path(self) -> str:
        # per-host file: each process's loader shard has its own position
        from monodepth_tpu.parallel.distributed import process_index

        return os.path.join(self.cfg.checkpoint_dir,
                            f"data_state_p{process_index()}.json")

    def _write_data_state(self, data: dict):
        """Atomic sidecar write (tmp + rename): a crash mid-write must leave
        the previous consistent loader position, not a truncated JSON."""
        import json

        path = self._data_state_path()
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f)
        os.replace(tmp, path)

    def _read_data_state(self):
        import json

        path = self._data_state_path()
        if not os.path.exists(path):
            return None
        try:
            with open(path) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError):  # pragma: no cover
            return None

    def _restore_one(self, key):
        """Template restore of one checkpoint key; tolerates checkpoints
        from before the rng/boundary fields existed (legacy saves were all
        epoch-boundary, with the RNG restarted from the seed)."""
        template = self._state_dict()
        try:
            return self._ckpt_mgr.restore(step=key, template=template)
        except Exception:
            legacy = {k: v for k, v in template.items()
                      if k not in ("rng", "boundary")}
            restored = self._ckpt_mgr.restore(step=key, template=legacy)
            restored["rng"] = self._rng
            restored["boundary"] = 1
            return restored

    def _try_resume(self):
        """Resume from the newest RESUMABLE checkpoint: an epoch-boundary
        save, or a step-cadence save whose sidecar loader position matches.
        A mid-epoch save whose sidecar was lost (crash between the orbax
        save and the sidecar write) is skipped — falling back one cadence
        loses at most `checkpoint_every_steps` steps instead of silently
        re-training the epoch prefix with an inflated step counter."""
        keys = self._ckpt_mgr.all_steps()
        if not keys:
            return
        sidecar = self._read_data_state()
        chosen = pending = None
        for key in reversed(keys):
            restored = self._restore_one(key)
            if int(restored.get("boundary", 1)):
                chosen = restored
                break
            if (sidecar is not None
                    and int(sidecar.get("step", -1)) == int(restored["step"])):
                chosen, pending = restored, sidecar["loader"]
                break
            print(f"  checkpoint key {key}: mid-epoch state without a "
                  f"matching data-loader position — skipping")
        if chosen is None:  # every key is an orphaned mid-epoch state
            chosen = self._restore_one(keys[-1])
            print("Warning: resuming a mid-epoch checkpoint whose data-"
                  "loader position is lost; the epoch restarts and some "
                  "batches will repeat")
        self.params = chosen["params"]
        self.batch_stats = chosen["batch_stats"]
        self.opt_state = chosen["opt_state"]
        self.step = int(chosen["step"])
        self.epoch = int(chosen["epoch"])
        self._rng = jnp.asarray(chosen["rng"])
        self._pending_data_state = pending
        if self.mesh is not None:
            # Orbax restores host-replicated arrays: re-place params on the
            # mesh, then re-place the optimizer state leaf-by-leaf onto a
            # freshly-initialized template (same tree; its leaves carry the
            # correct TP/FSDP shardings because params are placed first).
            self._place_on_mesh()
            template = self.tx.init(self.params)
            self.opt_state = jax.tree_util.tree_map(
                lambda restored, like: jax.device_put(
                    jnp.asarray(restored), like.sharding)
                if hasattr(like, "sharding") else restored,
                self.opt_state, template,
            )
        print(f"Resumed from checkpoint at epoch {self.epoch}, step {self.step}"
              + (" (+ mid-epoch data state)" if pending is not None else ""))

    def save_model(self, step: Optional[int] = None, boundary: bool = True):
        # Multi-host: EVERY process calls save — orbax's save is a
        # collective; cross-process-sharded leaves (TP/FSDP) are written as
        # one distributed array with each process contributing its shards
        # (a process-0-only gate would fail on non-addressable leaves).
        # Orbax itself restricts metadata writes to the primary process.
        if self._ckpt_mgr is None:
            return
        fingerprint = (self.step, self.epoch, bool(boundary))
        if step is None and getattr(self, "_last_saved", None) == fingerprint:
            return  # identical state already on disk (e.g. CLI's final save)
        self._ckpt_mgr.save(step if step is not None else self._ckpt_mgr.next_key(),
                            self._state_dict(boundary))
        self._last_saved = fingerprint

    # ----------------------------------------------------------- batches
    def _prep_batch(self, batch):
        import numpy as _np

        images = _np.asarray(batch["image"])
        if "depth" in batch and self.cfg.loss_mode == "supervised":
            # rendered GT rides as channel 3 (split inside the train step,
            # like sequence mode's 6-channel packing)
            images = _np.concatenate(
                [images, _np.asarray(batch["depth"])], axis=-1)
        scales = _np.asarray(
            [disp_scale_factor(m) for m in batch["metadata"]], _np.float32
        )
        if self.mesh is not None:
            # Trim ragged batches to this host's shard multiple: an uneven
            # split can't be placed on the data axis (device_put raises),
            # and padded rows would pollute gradients / val metrics.  A
            # too-small final batch trims to zero rows — callers skip it.
            local = max(self.mesh.shape["data"] // jax.process_count(), 1)
            keep = (len(images) // local) * local
            if keep != len(images):
                if not self._warned_ragged:
                    self._warned_ragged = True
                    print(f"Note: trimming ragged batches to a multiple of "
                          f"{local} rows for the data={self.mesh.shape['data']} "
                          f"mesh (e.g. {len(images)} -> {keep})")
                images, scales = images[:keep], scales[:keep]
            if keep == 0:
                return images, scales
            # per-host shards -> one global sharded array (multi-host safe;
            # single-host this equals a sharded device_put)
            from monodepth_tpu.parallel.distributed import (
                host_local_batch_to_global,
            )

            return host_local_batch_to_global((images, scales), self.mesh)
        return jnp.asarray(images), jnp.asarray(scales)

    # ------------------------------------------------------------ epochs
    def train_one_epoch(self) -> Dict[str, float]:
        totals = {"total": 0.0, "depth": 0.0, "smoothness": 0.0}
        n = 0
        every = self.cfg.checkpoint_every_steps
        ckpt_it = None
        if (every and self._ckpt_mgr is not None
                and hasattr(self.train_loader, "checkpointable_iter")):
            ckpt_it = self.train_loader.checkpointable_iter(
                epoch=self.epoch, state=getattr(self, "_pending_data_state",
                                                None))
            self._pending_data_state = None
            batches = ckpt_it
        else:
            batches = self.train_loader
        for batch in batches:
            images, scales = self._prep_batch(batch)
            if images.shape[0] == 0:  # ragged tail trimmed away (mesh)
                continue
            self._rng, step_rng = jax.random.split(self._rng)
            self.params, self.batch_stats, self.opt_state, losses = self._train_step(
                self.params, self.batch_stats, self.opt_state, images, scales, step_rng
            )
            self.step += 1
            n += 1
            for k in totals:
                totals[k] += float(losses[k])
            if ckpt_it is not None and self.step % every == 0:
                # orbax first, sidecar second: if preempted between the two,
                # resume skips the orphaned mid-epoch key and falls back one
                # cadence (see _try_resume) instead of replaying the epoch
                self.save_model(boundary=False)
                self._write_data_state({"step": self.step,
                                        "loader": ckpt_it.get_state()})
        return {k: v / max(n, 1) for k, v in totals.items()}

    def validate(self):
        totals = {"total": 0.0, "depth": 0.0, "smoothness": 0.0}
        metrics = {k: 0.0 for k in self.METRIC_NAMES}
        n = 0
        for batch in self.val_loader:
            images, scales = self._prep_batch(batch)
            if images.shape[0] == 0:  # ragged tail trimmed away (mesh)
                continue
            self._rng, step_rng = jax.random.split(self._rng)
            losses, errs = self._eval_step(
                self.params, self.batch_stats, images, scales, step_rng
            )
            n += 1
            for k in totals:
                totals[k] += float(losses[k])
            for name, val in zip(self.METRIC_NAMES, errs):
                metrics[name] += float(val)
        if n == 0:
            print("Warning: validation split is empty — metrics reported as NaN "
                  "(increase the dataset or adjust the split fractions).")
            return ({k: float("nan") for k in totals},
                    {k: float("nan") for k in metrics})
        totals = {k: v / n for k, v in totals.items()}
        metrics = {k: v / n for k, v in metrics.items()}
        return totals, metrics

    def finetune(self, num_epochs: Optional[int] = None) -> Dict:
        num_epochs = num_epochs or self.cfg.num_epochs
        print("Starting Mars domain adaptation...")
        print(f"  Model: {'Enhanced ' if self.cfg.model.enhanced else ''}Depth Anything")
        print(f"  Devices: {jax.device_count()}  Epochs: {num_epochs}")
        print(f"  LR: {self.cfg.learning_rate} (encoder x{self.cfg.encoder_lr_factor})")
        print(f"  Batch size: {self.cfg.batch_size}")

        from monodepth_tpu.utils.logging import MetricsLogger

        logger = MetricsLogger(
            self.cfg.checkpoint_dir and f"{self.cfg.checkpoint_dir}/logs"
        )
        history = []
        start_epoch = self.epoch
        for epoch in range(start_epoch, num_epochs):
            t0 = time.time()
            train_losses = self.train_one_epoch()
            val_losses, val_metrics = self.validate()
            self.epoch = epoch + 1
            logger.log(epoch + 1, train_losses, prefix="train")
            logger.log(epoch + 1, val_losses, prefix="val")
            logger.log(epoch + 1, val_metrics, prefix="metrics")

            print(f"Epoch {epoch + 1}/{num_epochs}")
            print(f"  Train loss: {train_losses['total']:.4f}")
            print(f"  Val loss: {val_losses['total']:.4f}")
            for k, v in val_metrics.items():
                print(f"    {k}: {v:.4f}")
            print(f"  Time: {time.time() - t0:.2f}s")
            history.append({"train": train_losses, "val": val_losses,
                            "metrics": val_metrics})

            if (epoch + 1) % self.cfg.checkpoint_every == 0 or epoch == num_epochs - 1:
                self.save_model()  # boundary save (monotonic sequence key)
                # the boundary state supersedes any mid-epoch loader position
                path = self._data_state_path()
                if os.path.exists(path):
                    os.remove(path)
        logger.close()
        print("Mars domain adaptation completed!")
        return {"history": history}
