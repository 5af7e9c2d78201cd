"""Jitted train/eval steps over a data mesh.

Replaces the reference's mmcv IterBasedRunner + DDP + OptimizerHook
(reference: apis/train.py) with a pure train_step: loss -> grad -> clipped
Adam update, all inside one jit.  Data parallelism comes from sharded batch
inputs; XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses.assembly import LossConfig, codd_train_loss

__all__ = ["TrainState", "create_train_state", "make_train_step"]


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_cfg: LossConfig,
    donate: bool = False,
    bf16_compute: bool = False,
    accum_steps: int = 1,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict]]:
    """Build the jitted training step.

    batch keys: l_img/r_img (B,T,H,W,3), gt_disp (B,T,H,W,1), intrinsics
    (B,4), plus optional gt_flow / gt_disp_change / gt_flow_occ / gt_disp2 /
    gt_semantic_seg.  Loss keys starting with "loss" sum into the total
    (reference _parse_losses contract, codd.py:708-711); logs are mean
    across devices automatically (they are computed on sharded data inside
    jit, so XLA emits the psum the reference does by hand at codd.py:716-720).

    ``accum_steps > 1`` splits the batch axis into that many microbatches
    and averages their gradients before the (single) optimizer update —
    identical math to the full batch (losses are batch means), with peak
    activation memory of one microbatch.  Requires B % accum_steps == 0.
    """

    def micro_loss(params, batch):
        gt_seq = {k: v for k, v in batch.items() if k.startswith("gt_")}
        l_img, r_img = batch["l_img"], batch["r_img"]
        if bf16_compute:
            # mixed precision: f32 master params, bf16 compute (the
            # autodiff through the cast yields f32 grads); dtype
            # promotion means both params and images must be cast
            from ..utils.precision import cast_floats
            params = cast_floats(params, jnp.bfloat16)
            l_img = l_img.astype(jnp.bfloat16)
            r_img = r_img.astype(jnp.bfloat16)
        outs = model.apply(params, l_img, r_img,
                           batch["intrinsics"], train=True,
                           gt_seq=gt_seq or None)
        if bf16_compute:
            outs = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32)
                if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x,
                outs)
        return codd_train_loss(loss_cfg, outs, batch)

    def step_fn(state: TrainState, batch):
        if accum_steps == 1:
            (loss, logs), grads = jax.value_and_grad(
                micro_loss, has_aux=True)(state.params, batch)
        else:
            B = batch["l_img"].shape[0]
            assert B % accum_steps == 0, (
                f"batch {B} not divisible by accum_steps {accum_steps}")
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((accum_steps, B // accum_steps)
                                    + x.shape[1:]), batch)

            def body(carry, mb):
                (loss, logs), grads = jax.value_and_grad(
                    micro_loss, has_aux=True)(state.params, mb)
                acc_loss, acc_logs, acc_grads = carry
                return (acc_loss + loss,
                        jax.tree_util.tree_map(jnp.add, acc_logs, logs),
                        jax.tree_util.tree_map(jnp.add, acc_grads, grads)
                        ), None

            zeros_like_f32 = lambda t: jax.tree_util.tree_map(  # noqa: E731
                lambda x: jnp.zeros(x.shape, x.dtype), t)
            shapes = jax.eval_shape(
                lambda p, m: jax.value_and_grad(micro_loss, has_aux=True)(
                    p, m),
                state.params,
                jax.tree_util.tree_map(lambda x: x[0], micro))
            (l0s, log0s), g0s = shapes
            init = (jnp.zeros(l0s.shape, l0s.dtype), zeros_like_f32(log0s),
                    zeros_like_f32(g0s))
            (loss, logs, grads), _ = jax.lax.scan(body, init, micro)
            inv = 1.0 / accum_steps
            loss = loss * inv
            logs = jax.tree_util.tree_map(lambda x: x * inv, logs)
            grads = jax.tree_util.tree_map(lambda x: x * inv, grads)
        # failure containment: a non-finite loss/grad step becomes a no-op
        # before it can poison the optimizer state (the TPU analogue of the
        # reference's detect_anomaly + NaN-zeroing GradientClip safety nets)
        gnorm = optax.global_norm(grads)
        # Per-ELEMENT non-finite zeroing (the reference GradientClip
        # semantics, raft3d.py:20-41) rather than a whole-step skip keyed
        # on isfinite(loss) & isfinite(gnorm): broadcasting that scalar
        # into selects over every gradient leaf while also returning the
        # aux log scalars miscompiles on the current XLA:TPU stack — the
        # fetched loss/gnorm read NaN even though the same graph minus
        # either ingredient is finite (empirically bisected; CPU is
        # unaffected, and an optimization_barrier does not help).  The
        # per-leaf condition keeps the optimizer state poison-free without
        # any cross-graph scalar edge.
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)),
            grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        logs["grad_norm"] = gnorm
        # pure log scalar (never feeds grads/params, so it cannot
        # reintroduce the bisected scalar-into-grad-selects miscompile):
        # a non-finite loss with finite grads is still a "skipped" step
        logs["step_skipped"] = (
            ~(jnp.isfinite(loss) & jnp.isfinite(gnorm))).astype(jnp.float32)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), logs

    # The round-2 donation corruption (NaN loss/grads from step 0 when the
    # TrainState was donated) is GONE on the current axon/XLA:TPU stack —
    # re-validated 2026-08-19 with scripts/repro_donation.py: finite
    # losses both ways (only scheduling-level f32 rounding differs).
    # donate stays opt-in at this layer because donation deletes the
    # caller's input buffers (callers that keep/reuse their state — tests,
    # notebooks — would break); the training loop, which owns its state,
    # passes donate=True (apis/train.py).
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
