# Motion finetune: OneCycle 2e-5, 100k/8 iters
# (reference configs/schedules/schedule_motion_finetune.py)
gpu_factor = 8
schedule = dict(
    kind="one_cycle",
    base_lr=2e-5,
    total_steps=100000 // gpu_factor,
    grad_clip=1.0,
)
evaluation = dict(interval=10000 // gpu_factor)
checkpoint = dict(interval=10000 // gpu_factor)
