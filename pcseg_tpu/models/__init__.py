from pcseg_tpu.models.pointnet import (
    PointNetSeg,
    pointnet_init,
    pointnet_apply,
)
