"""Config system.

The reference hardcodes every knob as a literal inside
``point_cloud_segmentation.py`` (data paths :137-138, batch size 64 :197,
workers 32 :199, lr/wd :217, StepLR(20, 0.5) :218, epochs 128 :221,
patience 16 :224, dropout 0.3 :96, class-2 weight boost x2 :175-176,
checkpoint name :382). Here those literals become documented defaults of
dataclass configs with CLI overrides (``--section.field=value``).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Sequence


@dataclass
class DataConfig:
    # HDF5 event files: datasets 'data' (flat float arrays reshaped (N,4))
    # and 'labels' (int (N,)) — reference pcs.py:33-35.
    data_path: str = "data/train_xyze_1e4.h5"
    label_path: str = "data/train_label_1e4.h5"
    batch_size: int = 64          # pcs.py:197
    val_fraction: float = 0.2     # pcs.py:192 (80/20 split)
    split_seed: int = 0           # reference split is unseeded (pcs.py:194); we seed
    shuffle_seed: int = 0
    class_scan_events: int = 1000  # pcs.py:149
    # Ragged->static batching: pad the per-batch max point count up to one of
    # these bucket lengths so XLA compiles a handful of static shapes
    # (replaces the reference's fully dynamic per-batch max, pcs.py:50).
    buckets: Sequence[int] = (256, 512, 1024, 2048, 4096, 8192)
    prefetch_depth: int = 2       # batches resident on device ahead of compute
                                  # (0 = inline; replaces the reference's
                                  # num_workers=32 processes, pcs.py:199)


@dataclass
class ModelConfig:
    name: str = "pointnet_seg"    # or "voxel_unet3d"
    num_classes: int = 0          # 0 = infer from data (pcs.py:153)
    input_dim: int = 4            # x, y, z, e — pcs.py:66
    dropout: float = 0.3          # pcs.py:96
    # Compute dtype for matmuls ("bfloat16" for MXU speed, "float32" for
    # bit-parity testing). Params/BN stats always live in float32.
    compute_dtype: str = "float32"
    # BN batch-variance algorithm: "exact" (two-pass, torch bit-parity)
    # or "fast" (single-pass sumsq, ~15% faster train steps).
    bn_stats: str = "exact"
    # If True, exclude padded positions from BN statistics and the global
    # max pool. The reference INCLUDES padding in both (pcs.py:106-127,
    # :114); default False reproduces that behavior.
    mask_norm_and_pool: bool = False
    # Voxel-family options (voxel_unet3d / sparse_voxelnet)
    grid_size: int = 64
    unet_width: int = 16
    # U-Net resolution levels (0 = family default: 3 for voxel_unet3d,
    # 1 = single-resolution for sparse_voxelnet's multi-level variant)
    levels: int = 0
    # jax.checkpoint rematerialization of the U-Net core (enables 128^3)
    remat: bool = False
    # voxelizer implementation for the voxel families: "scatter",
    # "matmul" (one-hot MXU contraction), or "auto" (measured crossover:
    # matmul 2.65x faster at R<=64, scatter wins at R128 — ops/voxel.py)
    voxelize_impl: str = "auto"
    # devoxelize forward for voxel_unet3d: "gather", "matmul" (mirrored
    # one-hot contraction), or "auto" (same crossover — ops/voxel.py)
    devox_impl: str = "auto"
    # sparse_voxelnet: submanifold conv blocks / static active-site
    # capacity per event / kernel implementation. "block" (dense conv on
    # occupied 8^3 tiles) is 2.4-3.2x faster than "dense" masked conv at
    # LArTPC occupancies and overflow is surfaced + soak-verified
    # (BASELINE.md r3); "dense" has no capacity caps, "gather" is the
    # classic rulebook (serializes on TPU).
    depth: int = 4
    max_active: int = 8192
    impl: str = "block"
    # block impl (sparse_voxelnet impl="block"): occupied-tile capacity
    # per event and tile edge (ops/block_sparse.py)
    max_tiles: int = 128
    tile: int = 8
    # optional per-level tile capacities, level 0 first (e.g. "64,32"):
    # coarse levels occupy at most as many tiles as fine ones and
    # usually far fewer, so a shrinking schedule cuts the deep levels'
    # padded compute; overflow at every level stays counted/surfaced
    max_tiles_schedule: tuple = ()
    # sparse capacity policy: overflow (occupied sites/tiles beyond
    # max_active/max_tiles) is always COUNTED and logged; strict_capacity
    # turns a nonzero count into a hard error (train loop + Predictor)
    strict_capacity: bool = False


@dataclass
class OptimConfig:
    lr: float = 1e-3              # pcs.py:217
    weight_decay: float = 1e-4    # pcs.py:217 — Adam L2 (coupled), NOT AdamW
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    lr_step_epochs: int = 20      # StepLR step_size — pcs.py:218
    lr_gamma: float = 0.5         # StepLR gamma — pcs.py:218


@dataclass
class TrainConfig:
    num_epochs: int = 128         # pcs.py:221
    patience: int = 16            # pcs.py:224
    target_class: int = 2         # best-model selection on class-2 F1 (pcs.py:346)
    target_class_weight_boost: float = 2.0  # pcs.py:175-176
    seed: int = 0
    checkpoint_dir: str = "checkpoints"
    checkpoint_name: str = "best_model"   # pcs.py:382 ('best_model.pth')
    # failure recovery: also write a 'latest' checkpoint every N epochs
    # (0 = only the best-model checkpoint, like the reference)
    save_latest_every: int = 1
    # per-step progress logging (0 = off). Logs are LAGGED by one window:
    # at step i the line reports step i - log_every_steps, whose metrics
    # are already materialized after N more dispatches, so reading them
    # never stalls the device pipeline (the reference's tqdm postfix
    # syncs on loss.item() every batch, pcs.py:268-271).
    log_every_steps: int = 20
    # Parallelism: number of devices on the mesh 'data' axis (0 = all
    # remaining after the model axis).
    data_parallel: int = 0
    # Mesh 'model' axis size (1 = no model parallelism).
    model_parallel: int = 1
    # Training strategy over the (data, model) mesh:
    #   "dp" — batch over 'data' only (the reference's DataParallel);
    #   "sp" — + point axis over 'model' (pointnet_seg; events past one
    #          chip's memory; parallel/sp.py);
    #   "tp" — + the wide layers Megatron column/row-sharded over 'model'
    #          with sharded param/optimizer state (pointnet_seg;
    #          parallel/tp.py);
    #   "gp" — + the voxel grid depth-sharded over 'model' (voxel_unet3d;
    #          grids past one chip's HBM; parallel/gp.py). Validation and
    #          Predictor serving run depth-sharded too
    #          (make_gp_eval_step / Predictor gp_mesh).
    parallelism: str = "dp"
    # Multi-host (DCN) bring-up: a non-empty coordinator address (e.g.
    # "10.0.0.1:8476") makes train_model call jax.distributed.initialize
    # before any device query, so the mesh spans every host's chips and
    # the same psum/ppermute collectives ride DCN across hosts
    # (parallel/mesh.py initialize_distributed). Leave num_processes=0 /
    # process_id=-1 to let JAX infer both from the TPU metadata server.
    coordinator_address: str = ""
    num_processes: int = 0
    process_id: int = -1
    # Per-replica BN running stats (DataParallel semantics, pcs.py:211) vs
    # cross-replica synced BN batch statistics.
    sync_batchnorm: bool = False
    debug_nans: bool = False
    profile_dir: str = ""         # non-empty => jax.profiler trace of epoch 0
    metrics_log: str = ""         # non-empty => JSONL per-epoch metrics
    tensorboard_dir: str = ""     # non-empty => TensorBoard scalars


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        d = self.to_dict()
        d["data"]["buckets"] = list(d["data"]["buckets"])
        return json.dumps(d, indent=2)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        cfg = cls()
        for section, values in d.items():
            sub = getattr(cfg, section)
            for k, v in values.items():
                if not hasattr(sub, k):
                    raise KeyError(f"unknown config field {section}.{k}")
                setattr(sub, k, v)
        return cfg


def _coerce(current: Any, raw: str) -> Any:
    if isinstance(current, bool):
        if raw.lower() in ("1", "true", "yes", "on"):
            return True
        if raw.lower() in ("0", "false", "no", "off"):
            return False
        raise ValueError(f"cannot parse bool from {raw!r}")
    if isinstance(current, int) and not isinstance(current, bool):
        return int(raw)
    if isinstance(current, float):
        return float(raw)
    if isinstance(current, (tuple, list)):
        return tuple(int(x) for x in raw.split(",") if x)
    return raw


def apply_overrides(cfg: Config, overrides: Sequence[str]) -> Config:
    """Apply ``section.field=value`` CLI overrides in place.

    Example: ``apply_overrides(cfg, ["optim.lr=3e-4", "data.batch_size=32"])``.
    """
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override {item!r} must look like section.field=value")
        key, raw = item.split("=", 1)
        key = key.lstrip("-")
        if "." not in key:
            raise ValueError(f"override key {key!r} must look like section.field")
        section, name = key.split(".", 1)
        sub = getattr(cfg, section, None)
        if sub is None or not hasattr(sub, name):
            raise KeyError(f"unknown config field {key!r}")
        setattr(sub, name, _coerce(getattr(sub, name), raw))
    return cfg
