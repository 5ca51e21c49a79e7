from cunet_tpu.ops.layers import (
    BN_EPS,
    BN_MOMENTUM,
    batch_norm,
    bn_inference_scale_shift,
    conv2d,
    init_bn,
    init_bn_state,
    init_conv,
    max_pool_2x2,
    relu,
    upsample_nearest_2x,
)
from cunet_tpu.ops.bottleneck import (
    dense_bottleneck,
    dense_bottleneck_infer_pallas,
    dense_bottleneck_remat,
    dense_bottleneck_train_pallas,
)

__all__ = [
    "BN_EPS",
    "BN_MOMENTUM",
    "batch_norm",
    "bn_inference_scale_shift",
    "conv2d",
    "dense_bottleneck",
    "dense_bottleneck_infer_pallas",
    "dense_bottleneck_train_pallas",
    "dense_bottleneck_remat",
    "init_bn",
    "init_bn_state",
    "init_conv",
    "max_pool_2x2",
    "relu",
    "upsample_nearest_2x",
]
