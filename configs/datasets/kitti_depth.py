# KITTI Depth (reference configs/datasets/kitti_depth.py)
data_root = "PATH_TO_DATA"
train_split = "PATH_TO_SPLIT"
val_split = "PATH_TO_SPLIT"
test_split = "PATH_TO_SPLIT"

calib = 384.38
disp_range = (1.0, 210.0)
intrinsics = [721.54, 721.54, 621, 187.5]  # 1242 x 375
batch_size = 4
crop_size = (320, 960)

data = dict(
    train=dict(
        preset="kitti_depth",
        split=train_split,
        data_root=data_root,
        num_frames=2,
        batch_size=batch_size,
        disp_range=disp_range,
        calib=calib,
        intrinsics=intrinsics,
        augment=dict(crop_size=crop_size, photometric=True, asym=False,
                     pad_size=crop_size),
    ),
    val=dict(
        preset="kitti_depth",
        split=val_split,
        data_root=data_root,
        num_frames=-1,
        disp_range=disp_range,
        calib=calib,
        intrinsics=intrinsics,
        pad_divisor=64,
    ),
    test=dict(
        preset="kitti_depth",
        split=test_split,
        data_root=data_root,
        num_frames=-1,
        disp_range=disp_range,
        calib=calib,
        intrinsics=intrinsics,
        pad_divisor=64,
    ),
)
