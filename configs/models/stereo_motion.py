# Stereo + motion, fusion disabled (reference configs/models/stereo_motion.py)
_base_ = ["codd.py"]

model = dict(
    fusion=None,
    train_cfg=dict(freeze_stereo=True),
)
