# Stereo pretrain: 340 epochs Adam 4e-4, MultiGamma decay
# (reference configs/schedules/schedule_stereo.py)
schedule = dict(
    kind="multi_gamma",
    base_lr=4e-4,
    by_epoch=True,
    total_epochs=340,
    milestones=[225, 293, 315],   # epochs
    gammas=[0.25, 0.4, 0.25],
    grad_clip=1.0,
)
evaluation = dict(interval=5000)
checkpoint = dict(interval=5000)
