"""Optimizer / schedule / train step (reference examples/train_common.py
parity, TPU-native).

Reference training recipe (train_common.py:122-190):
  * MomentumSGD(momentum=0.9), lr = 0.00125 * global_batch_size,
    WeightDecay(1e-4);
  * ExponentialShift x0.1 at 120/180 and 160/180 of the schedule;
  * conv1, bn1, res2 and every AffineChannel frozen via disable_update
    (:182-190 — the WeightDecay-leak workaround).

Here freezing is an optax mask (frozen params get exactly zero updates and no
weight decay), and the momentum update is chainer-exact: velocity accumulates
``-lr_t * (g + wd * w)`` so a LR drop does not retroactively rescale the
velocity (unlike optax.sgd which applies lr after the trace).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from mask_rcnn_tpu.models.mask_rcnn import MaskRCNNConfig
from mask_rcnn_tpu.models.train_model import train_loss

FROZEN_STAGES = ("conv1", "bn1", "res2")


def is_trainable(path) -> bool:
    """Reference freeze rules: extractor conv1/bn1/res2 and all folded-BN
    affines are frozen (train_common.py:182-190)."""
    keys = [getattr(k, "key", str(k)) for k in path]
    if keys[0] == "extractor" and keys[1] in FROZEN_STAGES:
        return False
    # Any bn* affine anywhere (extractor res3/4, head res5) is frozen.
    if any(k.startswith("bn") for k in keys):
        return False
    return True


def trainable_mask(params):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: is_trainable(path), params
    )


def step_lr_schedule(
    base_lr: float, total_steps: int, milestones=(120 / 180, 160 / 180),
    gamma: float = 0.1,
) -> Callable:
    boundaries = [int(m * total_steps) for m in milestones]

    def schedule(step):
        lr = jnp.asarray(base_lr, jnp.float32)
        for b in boundaries:
            lr = jnp.where(step >= b, lr * gamma, lr)
        return lr

    return schedule


def make_optimizer(
    params,
    base_lr: float,
    total_steps: int,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    milestones=(120 / 180, 160 / 180),
    clip_norm: float | None = None,
):
    mask = trainable_mask(params)
    not_mask = jax.tree.map(lambda m: not m, mask)
    schedule = step_lr_schedule(base_lr, total_steps, milestones)
    steps = []
    if clip_norm:
        # Not in the reference recipe (kept off by default for parity);
        # useful for from-scratch training without pretrained stats.
        steps.append(optax.clip_by_global_norm(clip_norm))
    steps += [
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_schedule(lambda step: -schedule(step)),
        optax.trace(decay=momentum),
    ]
    inner = optax.chain(*steps)
    # masked() leaves unmasked updates untouched, so explicitly zero the
    # frozen ones (their raw grads would leak through otherwise).
    tx = optax.chain(
        optax.masked(inner, mask),
        optax.masked(optax.set_to_zero(), not_mask),
    )
    return tx, schedule


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jnp.ndarray


def create_train_state(params, optimizer) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(cfg: MaskRCNNConfig, optimizer, proposal_cfg=None,
                    anchor_cfg=None):
    """Returns a pure (state, batch, rng) -> (state, metrics) step."""
    from mask_rcnn_tpu.models.targets import (
        AnchorTargetConfig,
        ProposalTargetConfig,
    )

    p_cfg = proposal_cfg or ProposalTargetConfig()
    a_cfg = anchor_cfg or AnchorTargetConfig()

    def step_fn(state: TrainState, batch, rng):
        # Derive the per-step key on device (rng stays a constant base key;
        # uploading a fresh key per step would cost a host round-trip).
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            return train_loss(
                params, cfg, batch, step_rng,
                anchor_cfg=a_cfg, proposal_cfg=p_cfg,
            )

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_opt, state.step + 1),
            metrics,
        )

    return step_fn
