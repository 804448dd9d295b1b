from pcseg_tpu.core.config import (
    DataConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
    Config,
)
