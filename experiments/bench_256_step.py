"""256^3-grid capability check: fused VoxelUNet3d full train step, 1 chip.

The north-star multi-chip topology (BASELINE.json configs[4]) targets
256^3 grids depth-sharded over a v5e-8 via parallel/gp.py; this measures
the single-chip leg — B1 x 32768 pts, w16, levels=3, remat, bf16 — to
pin the memory feasibility and the per-chip step time that GP would
divide. Grid arrays at this size: stem 256^3 x 16ch bf16 = 537 MB, so
remat is mandatory and voxelize/devoxelize must take their scatter /
gather branches (impl="auto" crossovers, ops/voxel.py).
"""

from experiments.bench_unet_fused import bench

if __name__ == "__main__":
    bench(1, 32768, 256, 16, 3, True, "fused")
