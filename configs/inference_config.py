# Inference entry config (reference configs/inference_config.py): the full
# CODD model + runtime defaults, no schedule.  Pair with `--img-dir` for
# raw-directory inference or override `data.test` via --options / a
# dataset config in _base_.
_base_ = [
    "models/codd.py",
    "default_runtime.py",
]
