# TartanAir (reference configs/datasets/tartanair.py)
data_root = "PATH_TO_DATA"
train_split = "PATH_TO_SPLIT"
val_split = "PATH_TO_SPLIT"
test_split = "PATH_TO_SPLIT"

calib = 320 * 0.25  # fx * baseline
disp_range = (1.0, 210.0)
intrinsics = [320, 320, 320, 240]  # 640 x 480
batch_size = 4
crop_size = (448, 640)

data = dict(
    train=dict(
        preset="tartanair", split=train_split, data_root=data_root,
        num_frames=2, batch_size=batch_size, disp_range=disp_range,
        calib=calib, intrinsics=intrinsics,
        augment=dict(crop_size=crop_size, photometric=True, asym=True),
    ),
    val=dict(
        preset="tartanair", split=val_split, data_root=data_root,
        num_frames=-1, disp_range=disp_range, calib=calib,
        intrinsics=intrinsics, pad_divisor=64,
    ),
    test=dict(
        preset="tartanair", split=test_split, data_root=data_root,
        num_frames=-1, disp_range=disp_range, calib=calib,
        intrinsics=intrinsics, pad_divisor=64,
    ),
)
