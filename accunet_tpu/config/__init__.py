from accunet_tpu.config.config import (
    Config,
    DataConfig,
    ModelConfig,
    TrainConfig,
    get_config,
    PRESETS,
    MODELS_224,
)
