"""One-off: fused 128^3/remat full train step re-measure."""
from experiments.bench_unet_fused import bench

if __name__ == "__main__":
    bench(1, 16384, 128, 16, 3, True, "fused")
