# Runtime defaults (reference configs/default_runtime.py)
runtime = dict(
    log_interval=50,
    seed=0,
    work_dir=None,   # CLI > cfg > derived-from-config-name
)
