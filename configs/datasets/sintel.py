# MPI Sintel (reference configs/datasets/sintel.py)
data_root = "PATH_TO_DATA"
train_split = "PATH_TO_SPLIT"
val_split = "PATH_TO_SPLIT"
test_split = "PATH_TO_SPLIT"

calib = 1120
disp_range = (1.0, 210.0)
intrinsics = [1120, 1120, 511.5, 217.5]
batch_size = 4
crop_size = (384, 768)

data = dict(
    train=dict(
        preset="sintel", split=train_split, data_root=data_root,
        num_frames=2, batch_size=batch_size, disp_range=disp_range,
        calib=calib, intrinsics=intrinsics,
        augment=dict(crop_size=crop_size, photometric=True, asym=True),
    ),
    val=dict(
        preset="sintel", split=val_split, data_root=data_root,
        num_frames=-1, disp_range=disp_range, calib=calib,
        intrinsics=intrinsics, pad_divisor=64,
    ),
    test=dict(
        preset="sintel", split=test_split, data_root=data_root,
        num_frames=-1, disp_range=disp_range, calib=calib,
        intrinsics=intrinsics, pad_divisor=64,
    ),
)
