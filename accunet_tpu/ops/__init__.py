from accunet_tpu.ops.pooling import (
    avg_pool2d,
    max_pool2d,
    upsample_nearest,
    global_avg_pool,
    hanc_features,
)
from accunet_tpu.ops.resize import resize_bilinear, upsample_bilinear_2x
from accunet_tpu.ops.conv import (
    conv2d,
    depthwise_conv2d,
    conv_transpose_2x2,
)
