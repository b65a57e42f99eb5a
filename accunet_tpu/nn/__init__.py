from accunet_tpu.nn.acc_blocks import (
    ChannelSELayer,
    HANCLayer,
    Conv2dBatchnorm,
    HANCBlock,
    ResPath,
    MLFC,
)
