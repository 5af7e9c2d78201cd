# Stereo-only model (reference configs/models/stereo.py)
max_disp = 320

model = dict(
    type="ConsistentOnlineDynamicDepth",
    stereo=dict(
        type="HITNetMF",
        initialization=dict(max_disp=max_disp),
        loss=dict(type="HITLoss", max_disp=max_disp, alpha=0.9, c=0.1),
    ),
    motion=None,
    fusion=None,
    train_cfg=dict(),
)
