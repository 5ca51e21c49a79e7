"""cunet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) coupled U-Net framework.

A from-scratch rebuild of the capabilities of zhiqiangdon/CU-Net (order-K
coupled U-Nets for landmark localization, memory-efficient dense blocks,
binarized/WAGE-quantized training, and the full MPII / 300-W pipeline),
re-designed TPU-first:

- NHWC layout, bf16 compute on the MXU, fp32 params/statistics.
- Functional models: parameters and batch-norm state are explicit pytrees;
  the reference's stateful coupling FIFOs become explicit loop carries.
- Memory efficiency via ``jax.checkpoint`` (remat) policies instead of the
  reference's shared-storage autograd hacks, plus Pallas fused kernels for
  the concat-free dense bottleneck.
- Scaling via ``jax.sharding.Mesh`` + XLA SPMD (batch data-parallelism and
  spatial partitioning), not replicate/scatter/gather.

Reference behavior citations in docstrings use ``ref:`` shorthand for
``/root/reference/``.
"""

from cunet_tpu.config import ModelConfig, TrainConfig, QuantConfig, loss_anchors

__version__ = "0.1.0"

__all__ = [
    "ModelConfig",
    "TrainConfig",
    "QuantConfig",
    "loss_anchors",
]
