"""Jitted training step: loss, gradients, param-group AdamW, LR schedule.

Parity targets:
  * param groups + AdamW (reference src/train.py:101-118): backbone at
    lr_backbone, reference_points/sampling_offsets at lr*mult,
    track-attention layers at lr_track, everything else at lr; conv1/bn1/
    layer1 of the trunk and all frozen-BN statistics get zero updates
    (reference freezes them via requires_grad, backbone.py:58-77);
  * MultiStepLR drop at lr_drop (train.py:120);
  * gradient clipping by global norm (engine.py:147-151);
  * distributed num_boxes normalization (detr.py:396-401) — here the global
    batch is sharded over the mesh and jit inserts the all-reduce.

One function handles detection and tracking training (the latter runs the
prev-frame forwards + track-query augmentation inside the same jit).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.criterion import CriterionConfig, compute_losses
from ..models.tracking import TrackingConfig, tracking_train_forward


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, optimizer):
        return cls(params=params, opt_state=optimizer.init(params),
                   step=jnp.int32(0))


def _param_label(path_str: str, lr_backbone_trainable: bool) -> str:
    """Map a flattened param path to its optimizer group."""
    if "backbone" in path_str:
        # frozen BN statistics/affine everywhere in the trunk
        if "/bn" in path_str or "downsample_bn" in path_str:
            return "frozen"
        # stem + layer1 frozen (reference backbone.py:70-73)
        if "trunk/conv1/" in path_str or "/layer1_" in path_str:
            return "frozen"
        return "backbone" if lr_backbone_trainable else "frozen"
    if "reference_points" in path_str or "sampling_offsets" in path_str:
        return "linear_proj"
    if "track_attention" in path_str:
        return "track"
    return "base"


def label_params(params, lr_backbone_trainable: bool = True):
    def path_to_str(path):
        return "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path) + "/"
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _param_label(path_to_str(path),
                                     lr_backbone_trainable), params)


def make_optimizer(args, params) -> optax.GradientTransformation:
    """Param-group AdamW with MultiStep LR drop and global-norm clipping."""
    # reference MultiStepLR accepts a single drop epoch or a list of them
    # (src/train.py:120); each milestone multiplies the LR by 0.1
    drop_steps = getattr(args, "lr_drop_steps", None)
    if drop_steps and not isinstance(drop_steps, (list, tuple)):
        drop_steps = [drop_steps]
    # TPU-only knob (no reference counterpart — torch trains post-norm DETR
    # at lr 2e-4 without warmup): linear LR warmup over the first N steps.
    # Deep post-norm stacks (notably the 6-layer windowed encoder) can fall
    # into the predict-dataset-statistics optimum when the decoder learns to
    # ignore the still-noisy encoder memory early; warmup keeps the early
    # updates small enough for signal to survive.
    warmup = int(getattr(getattr(args, "tpu", None), "lr_warmup_steps", 0)
                 or 0)

    def schedule(base_lr):
        if drop_steps:
            base = optax.piecewise_constant_schedule(
                base_lr, {int(s): 0.1 for s in sorted(drop_steps)})
        else:
            base = None
        if warmup:
            def warmed(step):
                lr = base(step) if base is not None else base_lr
                return lr * jnp.minimum(1.0, (step + 1) / warmup)
            return warmed
        return base if base is not None else base_lr

    def adamw(lr):
        return optax.adamw(schedule(lr), b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=args.weight_decay)

    labels = label_params(params, lr_backbone_trainable=args.lr_backbone > 0)
    tx = optax.multi_transform(
        {
            "base": adamw(args.lr),
            "backbone": adamw(args.lr_backbone),
            "linear_proj": adamw(args.lr * args.lr_linear_proj_mult),
            "track": adamw(getattr(args, "lr_track", args.lr)),
            "frozen": optax.set_to_zero(),
        },
        labels)
    return optax.chain(optax.clip_by_global_norm(args.clip_max_norm), tx)


def make_train_step(model, criterion_cfg: CriterionConfig,
                    optimizer: optax.GradientTransformation,
                    tracking_cfg: Optional[TrackingConfig] = None,
                    tracking: bool = False,
                    prev_prev: bool = False) -> Callable:
    """Returns train_step(state, batch_pack, rng) -> (state, metrics).

    batch_pack: dict with `batch` (FrameBatch) + `targets` (Targets) and, in
    tracking mode, `prev_batch`/`prev_targets` (+ optional prev_prev_*).
    """
    weight_dict = criterion_cfg.weight_dict

    def apply_fn(params, b, t, pf, rngs):
        return model.apply(params, b, t, pf, deterministic=False,
                           rngs=rngs)

    def loss_fn(params, pack, rng):
        r_track, r_drop = jax.random.split(rng)
        rngs = {"dropout": r_drop}
        if tracking:
            out, targets = tracking_train_forward(
                apply_fn, params, pack["batch"], pack["targets"],
                pack["prev_batch"], pack["prev_targets"], r_track,
                tracking_cfg,
                prev_prev_batch=pack.get("prev_prev_batch")
                if prev_prev else None,
                prev_prev_targets=pack.get("prev_prev_targets")
                if prev_prev else None,
                rngs_dropout=rngs)
        else:
            out, targets, _, _, _ = apply_fn(
                params, pack["batch"], pack["targets"], None, rngs)
        # global num_boxes: batch is sharded -> jit reduces across devices
        num_boxes = jnp.maximum(
            jnp.sum(targets.valid).astype(jnp.float32), 1.0)
        losses = compute_losses(out, targets, criterion_cfg, num_boxes)
        total = sum(losses[k] * w for k, w in weight_dict.items()
                    if k in losses)
        return total, losses

    def train_step(state: TrainState, pack: Dict, rng) -> Tuple[TrainState,
                                                                Dict]:
        rng = jax.random.fold_in(rng, state.step)
        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, pack, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), metrics

    return train_step
