from panopticnerf_tpu.config.config import (
    Config,
    DataConfig,
    LossConfig,
    ModelConfig,
    ParallelConfig,
    RenderConfig,
    TrainConfig,
    load_config,
    make_cfg,
)

__all__ = [
    "Config",
    "DataConfig",
    "LossConfig",
    "ModelConfig",
    "ParallelConfig",
    "RenderConfig",
    "TrainConfig",
    "load_config",
    "make_cfg",
]
