from vcagan.configs.base import (
    AudioConfig,
    DataConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
    VCAGANConfig,
    grid_config,
    lrs_config,
)

__all__ = [
    "AudioConfig",
    "DataConfig",
    "MeshConfig",
    "ModelConfig",
    "TrainConfig",
    "VCAGANConfig",
    "grid_config",
    "lrs_config",
]
