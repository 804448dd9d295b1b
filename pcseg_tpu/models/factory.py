"""Model factory: config -> model instance (all families share the same
init/apply duck-type, so every downstream component is family-agnostic)."""

from __future__ import annotations

from pcseg_tpu.core.config import ModelConfig
from pcseg_tpu.models.pointnet import PointNetSeg
from pcseg_tpu.models.sparse_unet import SparseVoxelNet
from pcseg_tpu.models.voxel_unet import VoxelUNet3d

FAMILIES = ("pointnet_seg", "voxel_unet3d", "sparse_voxelnet")


def build_model(cfg: ModelConfig, num_classes: int):
    if cfg.name == "pointnet_seg":
        return PointNetSeg(
            num_classes=num_classes,
            input_dim=cfg.input_dim,
            dropout=cfg.dropout,
            mask_norm_and_pool=cfg.mask_norm_and_pool,
            compute_dtype=cfg.compute_dtype,
            bn_stats=cfg.bn_stats,
        )
    if cfg.name == "voxel_unet3d":
        # cfg.impl doubles as the conv implementation here: "fused" or
        # "xla" force a core; the sparse family's "dense" default maps to
        # "auto" (fused Pallas blocks whenever bf16 + packing constraints
        # hold, XLA conv_general_dilated otherwise)
        return VoxelUNet3d(
            num_classes=num_classes,
            input_dim=cfg.input_dim,
            grid_size=cfg.grid_size,
            width=cfg.unet_width,
            levels=cfg.levels or 3,
            remat=cfg.remat,
            compute_dtype=cfg.compute_dtype,
            conv_impl=(cfg.impl if cfg.impl in ("fused", "xla") else "auto"),
            voxelize_impl=cfg.voxelize_impl,
            devox_impl=cfg.devox_impl,
        )
    if cfg.name == "sparse_voxelnet":
        return SparseVoxelNet(
            num_classes=num_classes,
            input_dim=cfg.input_dim,
            grid_size=cfg.grid_size,
            width=cfg.unet_width,
            depth=cfg.depth,
            max_active=cfg.max_active,
            impl=cfg.impl,
            max_tiles=cfg.max_tiles,
            tile=cfg.tile,
            max_tiles_schedule=tuple(cfg.max_tiles_schedule),
            levels=cfg.levels or 1,
            compute_dtype=cfg.compute_dtype,
            voxelize_impl=cfg.voxelize_impl,
        )
    raise ValueError(f"unknown model family {cfg.name!r}; options: {FAMILIES}")
