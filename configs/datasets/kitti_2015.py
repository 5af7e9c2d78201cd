# KITTI 2015 (reference configs/datasets/kitti_2015.py)
_base_ = ["kitti_depth.py"]

calib = 384.38
data = dict(
    train=dict(preset="kitti_2015"),
    val=dict(preset="kitti_2015"),
    test=dict(preset="kitti_2015"),
)
