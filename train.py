#!/usr/bin/env python
"""Train CLI (reference train.py equivalent).

Usage:
  python train.py configs/training_config.py [--work-dir D] [--load-from C]
      [--resume-from C] [--seed N] [--max-steps N] [--options k=v ...]

Distributed: instead of torch.distributed.launch, multi-host TPU runs call
``jax.distributed.initialize()`` (automatic on TPU pods) and run this same
script on every host; the data loader shards by process index.
"""

import argparse
import os.path as osp


def parse_args():
    p = argparse.ArgumentParser(description="Train a CODD estimator")
    p.add_argument("config")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--load-from", default=None,
                   help="weights-only checkpoint to initialize from")
    p.add_argument("--resume-from", default=None,
                   help="full checkpoint (params+optimizer+step) to resume")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--max-steps", type=int, default=None,
                   help="cap training steps (smoke tests)")
    p.add_argument("--options", nargs="+", default=None,
                   help="dot-path config overrides, e.g. model.iters=4")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (reference --detect_anomaly)")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from codd_tpu.utils.platform import honor_platform_env
    honor_platform_env()

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from codd_tpu.apis.train import train_estimator
    from codd_tpu.config import load_config

    cfg = load_config(args.config, args.options)
    if args.seed is not None:
        cfg.setdefault("runtime", {})["seed"] = args.seed

    work_dir = (args.work_dir or cfg.get("runtime", {}).get("work_dir")
                or osp.join("work_dirs",
                            osp.splitext(osp.basename(args.config))[0]))
    train_estimator(cfg, work_dir, load_from=args.load_from,
                    resume_from=args.resume_from, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
