#!/usr/bin/env python
"""Inference CLI (reference inference.py equivalent).

Usage:
  python inference.py CONFIG CHECKPOINT [--eval] [--show-dir D]
      [--num-frames N] [--out-csv F] [--options k=v ...]

--eval computes the metric tables; --show-dir saves per-sequence
``<name>.disp.pred.npz`` files like the reference (codd.py:577-599).
"""

import argparse


def parse_args():
    p = argparse.ArgumentParser(description="Run CODD inference")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None,
                   help="orbax checkpoint dir (omit for random weights)")
    p.add_argument("--eval", nargs="?", const="default", default=None,
                   choices=["default", "disp_only", "motion_only"],
                   help="compute metric tables; optional mode selects the "
                        "table set (reference evaluate(metric=...), "
                        "custom_stereo_mf.py:432-458)")
    p.add_argument("--show-dir", default=None)
    p.add_argument("--num-frames", type=int, default=None,
                   help="cap the number of sequences (reference --num-frames)")
    p.add_argument("--out-csv", default=None)
    p.add_argument("--split", choices=["val", "test"], default="test")
    p.add_argument("--img-dir", default=None,
                   help="run on a raw stereo image directory (no split file)")
    p.add_argument("--r-img-dir", default=None)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 inference (reference --fp16 equivalent)")
    p.add_argument("--options", nargs="+", default=None)
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from codd_tpu.utils.platform import honor_platform_env
    honor_platform_env()

    from codd_tpu.apis.inference import run_inference
    from codd_tpu.apis.train import build_dataset_from_cfg
    from codd_tpu.config import load_config
    from codd_tpu.models.builder import build_estimator
    from codd_tpu.train.checkpoint import restore_params

    cfg = load_config(args.config, args.options)
    model = build_estimator(cfg["model"])

    if args.img_dir:
        from codd_tpu.data.datasets import StereoVideoDataset
        from codd_tpu.data.pipelines import build_test_pipeline
        dcfg = dict(cfg["data"][args.split])
        dataset = StereoVideoDataset.from_dirs(
            args.img_dir, args.r_img_dir,
            intrinsics=dcfg.get("intrinsics"), calib=dcfg.get("calib"),
            pipeline=build_test_pipeline(dcfg.get("pad_divisor", 64)))
    else:
        dcfg = dict(cfg["data"][args.split])
        if args.num_frames is not None:
            dcfg["num_samples"] = args.num_frames
        dataset = build_dataset_from_cfg(dcfg, train=False)

    sample = dataset[0]
    T, H, W = (sample["imgs"].shape[0], *sample["imgs"].shape[1:3])
    init_l = jax.numpy.zeros((1, 2, H, W, 3))
    intr = jax.numpy.asarray(
        [sample["meta"].get("intrinsics") or [1.0, 1.0, 0, 0]],
        jax.numpy.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), init_l, init_l, intr)
    if args.checkpoint:
        params = restore_params(args.checkpoint, params)
    if args.bf16:
        from codd_tpu.utils.precision import bf16_params
        params = bf16_params(params)

    metrics = run_inference(model, params, dataset,
                            evaluate=bool(args.eval) and not args.show_dir,
                            show_dir=args.show_dir, out_csv=args.out_csv,
                            metric=args.eval or "default")
    if metrics:
        print({k: round(v, 4) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
