from cunet_tpu.models.cu_net import (
    apply_cu_net,
    create_cu_net,
    dense_block_channels,
    init_cu_net,
    is_stacked,
    stack_steady,
    unstack_steady,
)
from cunet_tpu.models.naive_dense_unet import (
    DenseUNetConfig,
    apply_dense_unet,
    init_dense_unet,
)

__all__ = [
    "apply_cu_net",
    "create_cu_net",
    "dense_block_channels",
    "init_cu_net",
    "is_stacked",
    "stack_steady",
    "unstack_steady",
    "DenseUNetConfig",
    "apply_dense_unet",
    "init_dense_unet",
]
