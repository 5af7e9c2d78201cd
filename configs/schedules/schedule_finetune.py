# Finetune: constant 2e-5 (reference configs/schedules/schedule_*_finetune.py)
gpu_factor = 8
schedule = dict(
    kind="constant",
    base_lr=2e-5,
    total_steps=100000 // gpu_factor,
    grad_clip=1.0,
)
evaluation = dict(interval=5000 // gpu_factor)
checkpoint = dict(interval=5000 // gpu_factor)
