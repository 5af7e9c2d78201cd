# Fusion finetune: OneCycle 2e-5, 50k/8 iters
# (reference configs/schedules/schedule_fusion_finetune.py)
gpu_factor = 8
schedule = dict(
    kind="one_cycle",
    base_lr=2e-5,
    total_steps=50000 // gpu_factor,
    grad_clip=1.0,
)
evaluation = dict(interval=5000 // gpu_factor)
checkpoint = dict(interval=5000 // gpu_factor)
