"""Optimizers and LR schedules for the three-stage CODD recipe.

Parity targets (reference configs/schedules/*):
  * stereo pretrain: Adam 4e-4, MultiGamma epoch milestones [225,293,315]
    with gammas [.25,.4,.25] (schedule_stereo.py, model/lr_updater.py:5-34)
  * motion:  OneCycle max_lr 2e-4, grad clip 1.0 (schedule_motion.py)
  * fusion:  OneCycle max_lr 2e-4 (schedule_fusion.py)
  * finetunes: constant 2e-5
Freeze flags are enforced twice: stop_gradient in the model and a
zero-update mask here (exact parity with torch requires_grad=False).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

__all__ = ["multi_gamma_schedule", "one_cycle_schedule", "make_optimizer",
           "freeze_mask"]


def multi_gamma_schedule(base_lr: float, milestones: Sequence[int],
                         gammas: Sequence[float]) -> Callable:
    """Per-milestone multiplicative decay (reference lr_updater.py:5-34).
    ``milestones`` are in optimizer steps."""
    milestones = list(milestones)
    gammas = list(gammas)

    def schedule(step):
        lr = jnp.asarray(base_lr, jnp.float32)
        for m, g in zip(milestones, gammas):
            lr = jnp.where(step >= m, lr * g, lr)
        return lr

    return schedule


def one_cycle_schedule(max_lr: float, total_steps: int,
                       pct_start: float = 0.3, div_factor: float = 25.0,
                       final_div_factor: float = 1e4) -> Callable:
    """mmcv OneCycle defaults (cos anneal)."""
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps, peak_value=max_lr,
        pct_start=pct_start, div_factor=div_factor,
        final_div_factor=final_div_factor)


def freeze_mask(params, frozen_prefixes: Sequence[str]):
    """True (trainable) / False (frozen) mask by top-level module name."""
    flat = jax.tree_util.tree_map_with_path(
        lambda path, _: not any(
            str(getattr(path[i], "key", "")) in frozen_prefixes
            for i in range(min(2, len(path)))),
        params)
    return flat


def make_optimizer(
    schedule: Callable,
    grad_clip: float = 1.0,
    params=None,
    frozen_prefixes: Sequence[str] = (),
) -> optax.GradientTransformation:
    """Adam + global-norm clip 1.0 (reference schedules) + optional freeze."""
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adam(schedule),
    )
    if frozen_prefixes and params is not None:
        mask = freeze_mask(params, frozen_prefixes)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree_util.tree_map(
                lambda t: "train" if t else "freeze", mask),
        )
    return tx
