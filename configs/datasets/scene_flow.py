# SceneFlow / FlyingThings3D (reference configs/datasets/scene_flow.py)
data_root = "PATH_TO_DATA"
train_split = "PATH_TO_SPLIT"
val_split = "PATH_TO_SPLIT"
test_split = "PATH_TO_SPLIT"

calib = 1050
disp_range = (1.0, 210.0)
intrinsics = [1050, 1050, 480, 270]
batch_size = 4
crop_size = (384, 768)

data = dict(
    train=dict(
        preset="scene_flow",
        split=train_split,
        data_root=data_root,
        num_frames=2,
        batch_size=batch_size,
        disp_range=disp_range,
        calib=calib,
        intrinsics=intrinsics,
        augment=dict(crop_size=crop_size, photometric=True, asym=True),
    ),
    val=dict(
        preset="scene_flow",
        split=val_split,
        data_root=data_root,
        num_frames=-1,
        disp_range=disp_range,
        calib=calib,
        intrinsics=intrinsics,
        pad_divisor=64,
    ),
    test=dict(
        preset="scene_flow",
        split=test_split,
        data_root=data_root,
        num_frames=-1,
        disp_range=disp_range,
        calib=calib,
        intrinsics=intrinsics,
        pad_divisor=64,
    ),
)
