"""Training orchestration (the reference apis/train.py equivalent).

Flow: build model + loss config from the model dict, dataset + pipeline
from the data dict, schedule + Adam + clip from the schedule dict, then run
the jitted train step over a data mesh with periodic logging / checkpoints
/ validation.  Multi-host: call jax.distributed.initialize() before this,
and every host runs the same code on its own data shard.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..data.datasets import make_dataset
from ..data.loader import Prefetcher, batch_iterator
from ..data.pipelines import build_test_pipeline, build_train_pipeline
from ..models.builder import build_estimator, build_loss_config
from ..parallel.mesh import make_mesh, shard_batch
from ..train.checkpoint import restore_checkpoint, restore_params, save_checkpoint
from ..train.optim import (make_optimizer, multi_gamma_schedule,
                           one_cycle_schedule)
from ..train.trainer import create_train_state, make_train_step

__all__ = ["build_schedule", "build_dataset_from_cfg", "train_estimator"]


def build_schedule(sched_cfg: Dict[str, Any], steps_per_epoch: int = 1):
    kind = sched_cfg.get("kind", "constant")
    lr = float(sched_cfg["base_lr"])
    if kind == "multi_gamma":
        milestones = sched_cfg["milestones"]
        if sched_cfg.get("by_epoch", False):
            milestones = [m * steps_per_epoch for m in milestones]
        return multi_gamma_schedule(lr, milestones, sched_cfg["gammas"])
    if kind == "one_cycle":
        return one_cycle_schedule(lr, int(sched_cfg["total_steps"]))
    return optax.constant_schedule(lr)


def build_dataset_from_cfg(dcfg: Dict[str, Any], train: bool, seed: int = 0):
    dcfg = dict(dcfg)
    preset = dcfg.pop("preset")
    aug = dcfg.pop("augment", None)
    dcfg.pop("batch_size", None)
    pad_divisor = dcfg.pop("pad_divisor", 64)
    if train:
        pipeline = build_train_pipeline(aug, seed=seed)
    else:
        pipeline = build_test_pipeline(pad_divisor)
    return make_dataset(preset, pipeline=pipeline, **dcfg)


def _device_batch(batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    out = {}
    for k, v in batch.items():
        if k == "meta":
            continue
        out[k] = jnp.asarray(v)
    return out


def train_estimator(
    cfg,
    work_dir: str,
    load_from: Optional[str] = None,
    resume_from: Optional[str] = None,
    max_steps: Optional[int] = None,
    log=print,
):
    os.makedirs(work_dir, exist_ok=True)
    seed = int(cfg.get("runtime", {}).get("seed", 0))

    model = build_estimator(cfg["model"])
    train_dcfg = cfg["data"]["train"]
    loss_cfg = build_loss_config(
        cfg["model"], disp_range=tuple(train_dcfg.get("disp_range", (1.0, 210.0))))

    dataset = build_dataset_from_cfg(train_dcfg, train=True, seed=seed)
    batch_size = int(train_dcfg.get("batch_size", 4))
    steps_per_epoch = max(len(dataset) // batch_size, 1)

    sched_cfg = cfg["schedule"]
    total_steps = int(sched_cfg.get("total_steps")
                      or sched_cfg.get("total_epochs", 1) * steps_per_epoch)
    if max_steps is not None:
        total_steps = min(total_steps, max_steps)
    schedule = build_schedule(sched_cfg, steps_per_epoch)

    # init params from one real batch's shapes
    it = batch_iterator(dataset, batch_size, seed=seed,
                        host_id=jax.process_index(),
                        num_hosts=jax.process_count())
    first_batch = _device_batch(next(it))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(seed), first_batch["l_img"], first_batch["r_img"],
        first_batch["intrinsics"])

    train_cfg = cfg["model"].get("train_cfg") or {}
    frozen = [name for flag, name in (("freeze_stereo", "stereo"),
                                      ("freeze_motion", "motion"),
                                      ("freeze_fusion", "fusion"))
              if train_cfg.get(flag)]
    tx = make_optimizer(schedule, float(sched_cfg.get("grad_clip", 1.0)),
                        params=params, frozen_prefixes=frozen)
    state = create_train_state(params, tx)

    if resume_from:
        state = restore_checkpoint(resume_from, state)
        log(f"resumed from {resume_from} at step {int(state.step)}")
    elif load_from:
        state = state.replace(params=restore_params(load_from, params))
        log(f"loaded weights from {load_from}")

    bf16 = bool(cfg.get("runtime", {}).get("bf16_compute", False))
    # microbatch gradient accumulation (schedule.accum_steps): recipe-scale
    # effective batches on one chip when the full batch does not fit
    accum = int(cfg.get("schedule", {}).get("accum_steps", 1))
    # donate=True: the loop owns its TrainState, so the params+opt_state
    # update aliases in place instead of copying every step (the r2
    # donation miscompile is gone — repro_donation.py, 2026-08-19)
    step_fn = make_train_step(model, tx, loss_cfg, bf16_compute=bf16,
                              accum_steps=accum, donate=True)
    if bf16:
        log("bf16 compute enabled (f32 master params)")
    # mesh size must divide the per-host batch
    n_dev = len(jax.local_devices())
    while batch_size % n_dev:
        n_dev -= 1
    mesh = make_mesh(n_dev)
    log_interval = int(cfg.get("runtime", {}).get("log_interval", 50))
    ckpt_interval = int(cfg.get("checkpoint", {}).get("interval", 5000))

    from ..utils.logging import MetricLogger
    mlog = MetricLogger(work_dir)

    # validation-during-training (reference EvalHook, apis/train.py:90-96)
    eval_interval = int(cfg.get("evaluation", {}).get("interval", 0) or 0)
    val_cfg = cfg.get("data", {}).get("val")
    _val = {"dataset": None}

    def run_validation(params, step):
        if not eval_interval or not val_cfg:
            return
        try:
            if _val["dataset"] is None:
                _val["dataset"] = build_dataset_from_cfg(dict(val_cfg),
                                                         train=False)
            from .inference import run_inference
            metrics = run_inference(model, params, _val["dataset"],
                                    evaluate=True, log=log)
            mlog.log(step, {f"val/{k}": v for k, v in metrics.items()})
        except (OSError, FileNotFoundError) as e:
            log(f"validation skipped: {e}")

    t0 = time.time()
    start = int(state.step)
    with mesh:
        for batch in Prefetcher(it):
            if int(state.step) >= total_steps:
                break
            db = shard_batch(_device_batch(batch), mesh)
            state, logs = step_fn(state, db)
            step = int(state.step)
            if step % log_interval == 0 or step == total_steps:
                loss = float(logs["loss"])
                lr = float(schedule(step))
                ips = (step - start) / max(time.time() - t0, 1e-6)
                log(f"step {step}/{total_steps} loss={loss:.4f} "
                    f"lr={lr:.2e} it/s={ips:.2f} "
                    f"grad_norm={float(logs['grad_norm']):.3f}")
                mlog.log(step, {**logs, "lr": lr, "it_per_s": ips})
            if step % ckpt_interval == 0 or step == total_steps:
                path = save_checkpoint(
                    os.path.join(work_dir, f"ckpt_{step}"), state,
                    meta={"step": step, "config": dict(cfg)})
                log(f"saved {path}")
            if eval_interval and step % eval_interval == 0:
                run_validation(state.params, step)
    mlog.close()
    return state
