# Full CODD model: stereo + motion + fusion (reference configs/models/codd.py)
max_disp = 320

iters = 16  # 16 for SceneFlow/KITTI, 1 for Sintel/TartanAir
motion_loss_weight = 0.5  # 0.5 joint training, 1.0 pretrain
fusion_loss_weight = 1.0
wr_weight = 1.0
wf_weight = 1.0

freeze_stereo = False
freeze_motion = False
freeze_fusion = False

model = dict(
    type="ConsistentOnlineDynamicDepth",
    stereo=dict(
        type="HITNetMF",
        initialization=dict(max_disp=max_disp),
        loss=dict(type="HITLoss", max_disp=max_disp, alpha=0.9, c=0.1),
    ),
    motion=dict(
        type="Motion",
        iters=iters,
        loss=dict(type="MotionLoss", loss_weight=motion_loss_weight),
    ),
    fusion=dict(
        type="Fusion",
        in_channels=24,
        fusion_channel=32,
        loss=dict(type="FusionLoss", loss_weight=fusion_loss_weight,
                  min_disp=1, max_disp=max_disp,
                  wr_weight=wr_weight, wf_weight=wf_weight),
    ),
    train_cfg=dict(
        freeze_stereo=freeze_stereo,
        freeze_motion=freeze_motion,
        freeze_fusion=freeze_fusion,
    ),
)
